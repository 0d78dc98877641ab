/* C ABI for embedding gemma_tpu in host applications
 * (maps gemma/bindings/c_api.h:44-82).
 *
 * The TPU runtime is JAX/XLA, which lives in a Python process; this
 * library embeds the CPython interpreter (once per process) and drives
 * gemma_tpu.bindings.context.GemmaContext.  Set PYTHONPATH so the
 * gemma_tpu package is importable before calling GemmaCreate.
 */

#ifndef GEMMA_TPU_NATIVE_C_API_H_
#define GEMMA_TPU_NATIVE_C_API_H_

#ifdef __cplusplus
extern "C" {
#endif

#if defined(_WIN32)
#define GEMMA_API __declspec(dllexport)
#else
#define GEMMA_API __attribute__((visibility("default")))
#endif

typedef struct GemmaContext GemmaContext;

/* Return 0/1 to stop/continue streaming (gemma/bindings/context.h:51). */
typedef int (*GemmaTokenCallback)(const char* text, void* user_data);
typedef void (*GemmaLogCallback)(const char* message, void* user_data);

GEMMA_API GemmaContext* GemmaCreate(const char* tokenizer_path,
                                    const char* weights_path,
                                    int max_generated_tokens);
GEMMA_API void GemmaDestroy(GemmaContext* ctx);

/* Returns length of generated text, or -1 on error. */
GEMMA_API int GemmaGenerate(GemmaContext* ctx, const char* prompt,
                            char* output, int max_output_chars,
                            GemmaTokenCallback callback, void* user_data);

/* image_data: float32 RGB [height][width][3], values 0..255. */
GEMMA_API int GemmaGenerateMultimodal(GemmaContext* ctx, const char* prompt,
                                      const void* image_data, int image_width,
                                      int image_height, char* output,
                                      int max_output_chars,
                                      GemmaTokenCallback callback,
                                      void* user_data);

GEMMA_API int GemmaCountTokens(GemmaContext* ctx, const char* text);

GEMMA_API void GemmaSetLogCallback(GemmaContext* ctx,
                                   GemmaLogCallback callback,
                                   void* user_data);

/* Runtime settings. */
GEMMA_API void GemmaSetMaxGeneratedTokens(GemmaContext* ctx, int value);
GEMMA_API void GemmaSetMultiturn(GemmaContext* ctx, int value);
GEMMA_API void GemmaSetTemperature(GemmaContext* ctx, float value);
GEMMA_API void GemmaSetTopK(GemmaContext* ctx, int value);
GEMMA_API void GemmaSetDeterministic(GemmaContext* ctx, int value);
GEMMA_API void GemmaSetPrefillTbatchSize(GemmaContext* ctx, int value);

/* Named conversation management (gemma/bindings/c_api.h:68-80). */
GEMMA_API void GemmaResetConversation(GemmaContext* ctx);
GEMMA_API void GemmaSaveConversation(GemmaContext* ctx);
GEMMA_API int GemmaCreateConversation(GemmaContext* ctx, const char* name);
GEMMA_API int GemmaSwitchConversation(GemmaContext* ctx, const char* name);
GEMMA_API int GemmaDeleteConversation(GemmaContext* ctx, const char* name);
GEMMA_API int GemmaHasConversation(GemmaContext* ctx, const char* name);
GEMMA_API const char* GemmaGetCurrentConversation(GemmaContext* ctx);

#ifdef __cplusplus
}
#endif

#endif /* GEMMA_TPU_NATIVE_C_API_H_ */
