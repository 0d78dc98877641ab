"""Build + exercise the native C ABI (native/c_api.cc) via ctypes.

Loading libgemma_tpu_c.so into this (Python) process makes EnsurePython a
no-op, so the C calls drive the same interpreter — exactly the embedding
path a C/C#/Rust host would use, minus Py_Initialize.
"""

import ctypes
import pathlib
import subprocess
import sysconfig

import pytest

from tests.test_frontends import tiny_model_file

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def libgemma(tmp_path_factory):
    build = tmp_path_factory.mktemp("native_build")
    include = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    so = build / "libgemma_tpu_c.so"
    cmd = [
        "g++", "-std=c++17", "-shared", "-fPIC", "-O2",
        str(ROOT / "native" / "c_api.cc"),
        f"-I{include}", f"-L{libdir}", "-lpython3.12",
        "-o", str(so),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.fail(f"native build failed:\n{proc.stderr}")
    lib = ctypes.CDLL(str(so))

    lib.GemmaCreate.restype = ctypes.c_void_p
    lib.GemmaCreate.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.GemmaDestroy.argtypes = [ctypes.c_void_p]
    lib.GemmaGenerate.restype = ctypes.c_int
    lib.GemmaGenerate.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.GemmaCountTokens.restype = ctypes.c_int
    lib.GemmaCountTokens.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    for name in ("GemmaCreateConversation", "GemmaSwitchConversation",
                 "GemmaDeleteConversation", "GemmaHasConversation"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.GemmaGetCurrentConversation.restype = ctypes.c_char_p
    lib.GemmaGetCurrentConversation.argtypes = [ctypes.c_void_p]
    lib.GemmaSetMaxGeneratedTokens.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.GemmaSetPrefillTbatchSize.argtypes = [ctypes.c_void_p, ctypes.c_int]
    return lib


def test_c_api_end_to_end(libgemma, tmp_path):
    lib = libgemma
    model = tiny_model_file(tmp_path).encode()
    ctx = lib.GemmaCreate(b"", model, 4)
    assert ctx, "GemmaCreate failed"
    try:
        lib.GemmaSetMaxGeneratedTokens(ctx, 3)
        lib.GemmaSetPrefillTbatchSize(ctx, 16)

        n = lib.GemmaCountTokens(ctx, b"hello world")
        assert n >= 2

        CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p)
        streamed = []

        @CB
        def on_token(text, user_data):
            streamed.append(text.decode())
            return 1

        out = ctypes.create_string_buffer(4096)
        n = lib.GemmaGenerate(ctx, b"hello", out, 4096,
                              ctypes.cast(on_token, ctypes.c_void_p), None)
        assert n >= 0
        assert out.value.decode() == "".join(streamed)

        # conversations
        assert lib.GemmaCreateConversation(ctx, b"other") == 1
        assert lib.GemmaSwitchConversation(ctx, b"other") == 1
        assert lib.GemmaGetCurrentConversation(ctx) == b"other"
        assert lib.GemmaHasConversation(ctx, b"other") == 1
        assert lib.GemmaDeleteConversation(ctx, b"other") == 1
        assert lib.GemmaGetCurrentConversation(ctx) == b"default"
    finally:
        lib.GemmaDestroy(ctx)
