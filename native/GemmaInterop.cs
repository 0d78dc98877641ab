// C# P/Invoke wrapper over the gemma_tpu C ABI
// (maps gemma/bindings/GemmaInterop.cs; see native/c_api.h).
//
// Requirements: libgemma_tpu_c.so on the library path and PYTHONPATH set so
// the gemma_tpu package is importable (the library embeds CPython).

using System;
using System.Runtime.InteropServices;
using System.Text;

namespace GemmaTpu
{
    public delegate int GemmaTokenCallback(string text, IntPtr userData);
    public delegate void GemmaLogCallback(string message, IntPtr userData);

    public static class GemmaNative
    {
        private const string Lib = "gemma_tpu_c";

        [DllImport(Lib)] public static extern IntPtr GemmaCreate(
            string tokenizerPath, string weightsPath, int maxGeneratedTokens);
        [DllImport(Lib)] public static extern void GemmaDestroy(IntPtr ctx);
        [DllImport(Lib)] public static extern int GemmaGenerate(
            IntPtr ctx, string prompt, StringBuilder output, int maxChars,
            GemmaTokenCallback callback, IntPtr userData);
        [DllImport(Lib)] public static extern int GemmaGenerateMultimodal(
            IntPtr ctx, string prompt, float[] imageData, int width,
            int height, StringBuilder output, int maxChars,
            GemmaTokenCallback callback, IntPtr userData);
        [DllImport(Lib)] public static extern int GemmaCountTokens(
            IntPtr ctx, string text);
        [DllImport(Lib)] public static extern void GemmaSetLogCallback(
            IntPtr ctx, GemmaLogCallback callback, IntPtr userData);
        [DllImport(Lib)] public static extern void GemmaSetMaxGeneratedTokens(
            IntPtr ctx, int value);
        [DllImport(Lib)] public static extern void GemmaSetMultiturn(
            IntPtr ctx, int value);
        [DllImport(Lib)] public static extern void GemmaSetTemperature(
            IntPtr ctx, float value);
        [DllImport(Lib)] public static extern void GemmaSetTopK(
            IntPtr ctx, int value);
        [DllImport(Lib)] public static extern void GemmaResetConversation(
            IntPtr ctx);
        [DllImport(Lib)] public static extern void GemmaSaveConversation(
            IntPtr ctx);
        [DllImport(Lib)] public static extern int GemmaCreateConversation(
            IntPtr ctx, string name);
        [DllImport(Lib)] public static extern int GemmaSwitchConversation(
            IntPtr ctx, string name);
        [DllImport(Lib)] public static extern int GemmaDeleteConversation(
            IntPtr ctx, string name);
        [DllImport(Lib)] public static extern int GemmaHasConversation(
            IntPtr ctx, string name);
        [DllImport(Lib)] public static extern IntPtr
            GemmaGetCurrentConversation(IntPtr ctx);
    }

    /// High-level wrapper with IDisposable lifetime management.
    public sealed class GemmaModel : IDisposable
    {
        private IntPtr _ctx;

        public GemmaModel(string weightsPath, string tokenizerPath = "",
                          int maxGeneratedTokens = 2048)
        {
            _ctx = GemmaNative.GemmaCreate(tokenizerPath, weightsPath,
                                           maxGeneratedTokens);
            if (_ctx == IntPtr.Zero)
                throw new InvalidOperationException("GemmaCreate failed");
        }

        public string Generate(string prompt, int maxChars = 1 << 20,
                               GemmaTokenCallback callback = null)
        {
            var output = new StringBuilder(maxChars);
            int n = GemmaNative.GemmaGenerate(_ctx, prompt, output, maxChars,
                                              callback, IntPtr.Zero);
            if (n < 0) throw new InvalidOperationException("generate failed");
            return output.ToString();
        }

        public int CountTokens(string text) =>
            GemmaNative.GemmaCountTokens(_ctx, text);

        public void Dispose()
        {
            if (_ctx != IntPtr.Zero)
            {
                GemmaNative.GemmaDestroy(_ctx);
                _ctx = IntPtr.Zero;
            }
        }
    }
}
