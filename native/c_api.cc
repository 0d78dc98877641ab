// C ABI implementation: embeds CPython and drives
// gemma_tpu.bindings.context.GemmaContext (see c_api.h).

#include "c_api.h"

#include <Python.h>

#include <cstring>
#include <string>

namespace {

// Initialize the interpreter once per process (no-op when the host IS a
// Python process, e.g. loading this library via ctypes).
bool EnsurePython() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(/*initsigs=*/0);
  }
  return Py_IsInitialized();
}

struct CallbackPair {
  GemmaTokenCallback token_cb;
  void* user_data;
};

// Python-callable trampoline: self is a capsule holding CallbackPair.
PyObject* TokenTrampoline(PyObject* self, PyObject* args) {
  const char* text = nullptr;
  if (!PyArg_ParseTuple(args, "s", &text)) return nullptr;
  auto* pair = static_cast<CallbackPair*>(
      PyCapsule_GetPointer(self, "gemma_tpu.cb"));
  const int keep_going = pair->token_cb ? pair->token_cb(text, pair->user_data)
                                        : 1;
  if (keep_going) Py_RETURN_TRUE;
  Py_RETURN_FALSE;
}

PyMethodDef kTokenTrampolineDef = {
    "token_cb", TokenTrampoline, METH_VARARGS, "stream token callback"};

struct LogPair {
  GemmaLogCallback log_cb;
  void* user_data;
};

PyObject* LogTrampoline(PyObject* self, PyObject* args) {
  const char* text = nullptr;
  if (!PyArg_ParseTuple(args, "s", &text)) return nullptr;
  auto* pair = static_cast<LogPair*>(
      PyCapsule_GetPointer(self, "gemma_tpu.logcb"));
  if (pair->log_cb) pair->log_cb(text, pair->user_data);
  Py_RETURN_NONE;
}

PyMethodDef kLogTrampolineDef = {
    "log_cb", LogTrampoline, METH_VARARGS, "log callback"};

class Gil {
 public:
  Gil() : state_(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

// Fetch+clear any pending Python error, printing it to stderr.
void LogPyError() {
  if (PyErr_Occurred()) PyErr_Print();
}

PyObject* CallMethod(PyObject* obj, const char* name, PyObject* args) {
  PyObject* method = PyObject_GetAttrString(obj, name);
  if (!method) return nullptr;
  PyObject* out = PyObject_CallObject(method, args);
  Py_DECREF(method);
  return out;
}

}  // namespace

struct GemmaContext {
  PyObject* py_ctx = nullptr;      // gemma_tpu.bindings.context.GemmaContext
  LogPair log = {nullptr, nullptr};
  std::string current_conversation;  // storage for GemmaGetCurrentConversation
};

extern "C" {

GemmaContext* GemmaCreate(const char* tokenizer_path,
                          const char* weights_path,
                          int max_generated_tokens) {
  if (!EnsurePython()) return nullptr;
  Gil gil;
  PyObject* mod = PyImport_ImportModule("gemma_tpu.bindings.context");
  if (!mod) {
    LogPyError();
    return nullptr;
  }
  PyObject* cls = PyObject_GetAttrString(mod, "GemmaContext");
  Py_DECREF(mod);
  if (!cls) {
    LogPyError();
    return nullptr;
  }
  PyObject* create = PyObject_GetAttrString(cls, "create");
  Py_DECREF(cls);
  PyObject* args = Py_BuildValue(
      "(szi)", weights_path,
      (tokenizer_path && tokenizer_path[0]) ? tokenizer_path : nullptr,
      max_generated_tokens);
  PyObject* py_ctx = PyObject_CallObject(create, args);
  Py_DECREF(args);
  Py_DECREF(create);
  if (!py_ctx) {
    LogPyError();
    return nullptr;
  }
  auto* ctx = new GemmaContext();
  ctx->py_ctx = py_ctx;
  return ctx;
}

void GemmaDestroy(GemmaContext* ctx) {
  if (!ctx) return;
  {
    Gil gil;
    Py_XDECREF(ctx->py_ctx);
  }
  delete ctx;
}

static int GenerateImpl(GemmaContext* ctx, const char* prompt,
                        PyObject* image_or_null, char* output,
                        int max_output_chars, GemmaTokenCallback callback,
                        void* user_data) {
  if (!ctx || !prompt || !output || max_output_chars <= 0) return -1;
  Gil gil;

  CallbackPair pair{callback, user_data};
  PyObject* py_cb = Py_None;
  PyObject* capsule = nullptr;
  if (callback) {
    capsule = PyCapsule_New(&pair, "gemma_tpu.cb", nullptr);
    py_cb = PyCFunction_New(&kTokenTrampolineDef, capsule);
  } else {
    Py_INCREF(Py_None);
  }

  PyObject* args = Py_BuildValue("(sOO)", prompt, py_cb,
                                 image_or_null ? image_or_null : Py_None);
  PyObject* result = CallMethod(ctx->py_ctx, "generate", args);
  Py_DECREF(args);
  Py_DECREF(py_cb);
  Py_XDECREF(capsule);
  if (!result) {
    LogPyError();
    return -1;
  }
  Py_ssize_t size = 0;
  const char* text = PyUnicode_AsUTF8AndSize(result, &size);
  if (!text) {
    Py_DECREF(result);
    return -1;
  }
  const int n = static_cast<int>(size < max_output_chars - 1
                                     ? size
                                     : max_output_chars - 1);
  std::memcpy(output, text, n);
  output[n] = '\0';
  Py_DECREF(result);
  return n;
}

int GemmaGenerate(GemmaContext* ctx, const char* prompt, char* output,
                  int max_output_chars, GemmaTokenCallback callback,
                  void* user_data) {
  return GenerateImpl(ctx, prompt, nullptr, output, max_output_chars,
                      callback, user_data);
}

int GemmaGenerateMultimodal(GemmaContext* ctx, const char* prompt,
                            const void* image_data, int image_width,
                            int image_height, char* output,
                            int max_output_chars, GemmaTokenCallback callback,
                            void* user_data) {
  if (!image_data || image_width <= 0 || image_height <= 0) return -1;
  Gil gil;
  // Build gemma_tpu.paligemma.image.Image from the float RGB buffer.
  PyObject* mod = PyImport_ImportModule("gemma_tpu.paligemma.image");
  if (!mod) {
    LogPyError();
    return -1;
  }
  PyObject* np = PyImport_ImportModule("numpy");
  PyObject* bytes = PyBytes_FromStringAndSize(
      static_cast<const char*>(image_data),
      static_cast<Py_ssize_t>(image_width) * image_height * 3 *
          sizeof(float));
  PyObject* frombuffer = PyObject_GetAttrString(np, "frombuffer");
  PyObject* fb_args = Py_BuildValue("(Os)", bytes, "float32");
  PyObject* flat = PyObject_CallObject(frombuffer, fb_args);
  Py_DECREF(fb_args);
  Py_DECREF(frombuffer);
  Py_DECREF(bytes);
  Py_DECREF(np);
  if (!flat) {
    Py_DECREF(mod);
    LogPyError();
    return -1;
  }
  PyObject* shape = Py_BuildValue("(iii)", image_height, image_width, 3);
  PyObject* reshape_args = Py_BuildValue("(O)", shape);
  PyObject* arr = CallMethod(flat, "reshape", reshape_args);
  Py_DECREF(reshape_args);
  Py_DECREF(shape);
  Py_DECREF(flat);

  PyObject* image_cls = PyObject_GetAttrString(mod, "Image");
  PyObject* from_array = PyObject_GetAttrString(image_cls, "from_array");
  PyObject* fa_args = Py_BuildValue("(O)", arr);
  PyObject* image = PyObject_CallObject(from_array, fa_args);
  Py_DECREF(fa_args);
  Py_DECREF(from_array);
  Py_DECREF(image_cls);
  Py_DECREF(arr);
  Py_DECREF(mod);
  if (!image) {
    LogPyError();
    return -1;
  }
  const int n = GenerateImpl(ctx, prompt, image, output, max_output_chars,
                             callback, user_data);
  Py_DECREF(image);
  return n;
}

int GemmaCountTokens(GemmaContext* ctx, const char* text) {
  if (!ctx || !text) return -1;
  Gil gil;
  PyObject* args = Py_BuildValue("(s)", text);
  PyObject* result = CallMethod(ctx->py_ctx, "count_tokens", args);
  Py_DECREF(args);
  if (!result) {
    LogPyError();
    return -1;
  }
  const long n = PyLong_AsLong(result);
  Py_DECREF(result);
  return static_cast<int>(n);
}

void GemmaSetLogCallback(GemmaContext* ctx, GemmaLogCallback callback,
                         void* user_data) {
  if (!ctx) return;
  Gil gil;
  ctx->log = {callback, user_data};
  PyObject* mod = PyImport_ImportModule("gemma_tpu.bindings.context");
  if (!mod) {
    LogPyError();
    return;
  }
  PyObject* cls = PyObject_GetAttrString(mod, "GemmaContext");
  Py_DECREF(mod);
  PyObject* py_cb;
  if (callback) {
    PyObject* capsule = PyCapsule_New(&ctx->log, "gemma_tpu.logcb", nullptr);
    py_cb = PyCFunction_New(&kLogTrampolineDef, capsule);
    Py_DECREF(capsule);  // PyCFunction_New holds its own reference
  } else {
    py_cb = Py_None;
    Py_INCREF(Py_None);
  }
  PyObject* args = Py_BuildValue("(O)", py_cb);
  PyObject* r = CallMethod(cls, "set_log_callback", args);
  Py_XDECREF(r);
  Py_DECREF(args);
  Py_DECREF(py_cb);
  Py_DECREF(cls);
}

#define GEMMA_SETTER(cname, pyname, fmt, ctype)                       \
  void cname(GemmaContext* ctx, ctype value) {                        \
    if (!ctx) return;                                                 \
    Gil gil;                                                          \
    PyObject* args = Py_BuildValue("(" fmt ")", value);               \
    PyObject* r = CallMethod(ctx->py_ctx, pyname, args);              \
    if (!r) LogPyError();                                             \
    Py_XDECREF(r);                                                    \
    Py_DECREF(args);                                                  \
  }

GEMMA_SETTER(GemmaSetMaxGeneratedTokens, "set_max_generated_tokens", "i", int)
GEMMA_SETTER(GemmaSetMultiturn, "set_multiturn", "i", int)
GEMMA_SETTER(GemmaSetTemperature, "set_temperature", "f", float)
GEMMA_SETTER(GemmaSetTopK, "set_top_k", "i", int)
GEMMA_SETTER(GemmaSetDeterministic, "set_deterministic", "i", int)
GEMMA_SETTER(GemmaSetPrefillTbatchSize, "set_prefill_tbatch_size", "i", int)

#undef GEMMA_SETTER

static int NameCall(GemmaContext* ctx, const char* method, const char* name) {
  if (!ctx || !name) return 0;
  Gil gil;
  PyObject* args = Py_BuildValue("(s)", name);
  PyObject* r = CallMethod(ctx->py_ctx, method, args);
  Py_DECREF(args);
  if (!r) {
    LogPyError();
    return 0;
  }
  const int ok = PyObject_IsTrue(r);
  Py_DECREF(r);
  return ok;
}

void GemmaResetConversation(GemmaContext* ctx) {
  if (!ctx) return;
  Gil gil;
  PyObject* r = CallMethod(ctx->py_ctx, "reset_conversation", nullptr);
  if (!r) LogPyError();
  Py_XDECREF(r);
}

void GemmaSaveConversation(GemmaContext* ctx) {
  if (!ctx) return;
  Gil gil;
  PyObject* r = CallMethod(ctx->py_ctx, "save_conversation", nullptr);
  if (!r) LogPyError();
  Py_XDECREF(r);
}

int GemmaCreateConversation(GemmaContext* ctx, const char* name) {
  return NameCall(ctx, "create_conversation", name);
}

int GemmaSwitchConversation(GemmaContext* ctx, const char* name) {
  return NameCall(ctx, "switch_conversation", name);
}

int GemmaDeleteConversation(GemmaContext* ctx, const char* name) {
  return NameCall(ctx, "delete_conversation", name);
}

int GemmaHasConversation(GemmaContext* ctx, const char* name) {
  return NameCall(ctx, "has_conversation", name);
}

const char* GemmaGetCurrentConversation(GemmaContext* ctx) {
  if (!ctx) return "";
  Gil gil;
  PyObject* r = CallMethod(ctx->py_ctx, "current_conversation", nullptr);
  if (!r) {
    LogPyError();
    return "";
  }
  const char* s = PyUnicode_AsUTF8(r);
  ctx->current_conversation = s ? s : "";
  Py_DECREF(r);
  return ctx->current_conversation.c_str();
}

}  // extern "C"
