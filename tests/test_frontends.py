"""End-to-end facade + HTTP server tests on a tiny on-disk model."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from gemma_tpu.compression import Type, compress_tensor
from gemma_tpu.gemma import Gemma
from gemma_tpu.io.model_store import write_model
from gemma_tpu.models.configs import (
    LayerConfig,
    Model,
    ModelConfig,
    PostNormType,
    PromptWrapping,
    QueryScaleType,
)

from tests.test_tokenizer import tiny_proto


VOCAB = 274  # tiny_proto piece count


def tiny_model_file(tmp_path, wrapping=PromptWrapping.GEMMA_IT) -> str:
    rng = np.random.default_rng(0)
    model_dim, heads, kv_heads, qkv_dim, ff = 32, 2, 1, 16, 64
    lc = LayerConfig(
        model_dim=model_dim, ff_hidden_dim=ff, heads=heads,
        kv_heads=kv_heads, qkv_dim=qkv_dim, post_norm=PostNormType.SCALE,
    )
    config = ModelConfig(
        model=Model.GEMMA2_2B, model_dim=model_dim, vocab_size=VOCAB,
        max_seq_len=64, num_layers=1, att_cap=50.0, final_cap=30.0,
        query_scale=QueryScaleType.SQRT_KEY_SIZE, weight=Type.SFP,
        wrapping=wrapping, display_name="tiny-test",
    )
    config.layer_configs = [lc]
    config.attention_window_sizes = [64]

    def t(name, *shape, sigma=0.3):
        return compress_tensor(Type.SFP, name,
                               rng.normal(0, sigma, shape).astype(np.float32))

    def norm(name, n):
        return compress_tensor(
            Type.BF16, name, rng.normal(0, 0.1, (1, n)).astype(np.float32))

    tensors = [
        t("c_embedding", VOCAB, model_dim, sigma=1.0),
        norm("c_final_norm", model_dim),
        t("qkv1_w_0", heads * qkv_dim, model_dim),
        t("qkv2_w_0", 2 * kv_heads * qkv_dim, model_dim),
        t("att_w_0", model_dim, heads * qkv_dim),
        t("gating1_w_0", ff, model_dim),
        t("gating2_w_0", ff, model_dim),
        t("linear_w_0", model_dim, ff),
        norm("pre_att_ns_0", model_dim),
        norm("pre_ff_ns_0", model_dim),
        norm("post_att_ns_0", model_dim),
        norm("post_ff_ns_0", model_dim),
    ]
    path = str(tmp_path / "tiny.sbs")
    write_model(path, config, tensors, tokenizer_proto=tiny_proto())
    return path


@pytest.fixture(scope="module")
def tiny_gemma(tmp_path_factory):
    path = tiny_model_file(tmp_path_factory.mktemp("model"))
    g = Gemma.load(path)
    g.runtime.seq_len = 64
    g.runtime.max_generated_tokens = 8
    g.runtime.prefill_tbatch_size = 16
    return g


def test_load_and_chat(tiny_gemma):
    g = tiny_gemma
    assert g.tokenizer.available
    text, n_prompt, n_out = g.generate_text("hello world",
                                            max_generated_tokens=4)
    assert isinstance(text, str)
    assert n_prompt > 2  # BOS + turn structure + words
    assert 0 <= n_out <= 4


def test_save_roundtrip(tiny_gemma, tmp_path):
    out = str(tmp_path / "resaved.sbs")
    tiny_gemma.save(out)
    g2 = Gemma.load(out)
    g2.runtime.max_generated_tokens = 4
    ids = g2.tokenizer.encode("hello")
    assert ids == tiny_gemma.tokenizer.encode("hello")
    a = tiny_gemma.generate([2] + ids, max_generated_tokens=3)
    b = g2.generate([2] + ids, max_generated_tokens=3)
    assert a == b


def test_http_server(tiny_gemma):
    from gemma_tpu.api_server import GemmaService, make_handler

    service = GemmaService(tiny_gemma, model_name="tiny")
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1beta/models") as r:
            models = json.loads(r.read())
        assert models["models"][0]["name"] == "models/tiny"

        body = json.dumps({
            "contents": [{"role": "user", "parts": [{"text": "hello"}]}],
            "generationConfig": {"maxOutputTokens": 3},
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1beta/models/tiny:generateContent",
            data=body, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert resp["candidates"][0]["content"]["role"] == "model"
        assert resp["candidates"][0]["finishReason"] == "STOP"
        assert resp["usageMetadata"]["promptTokenCount"] > 0
        assert "sessionId" in resp

        # Session continuation: same sessionId reuses the KV cache.
        body2 = json.dumps({
            "contents": [{"role": "user", "parts": [{"text": "world"}]}],
            "sessionId": resp["sessionId"],
            "generationConfig": {"maxOutputTokens": 2},
        }).encode()
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1beta/models/tiny:generateContent",
            data=body2, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2) as r:
            resp2 = json.loads(r.read())
        assert resp2["usageMetadata"]["totalTokenCount"] > \
            resp["usageMetadata"]["totalTokenCount"]

        # SSE streaming endpoint.
        req3 = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1beta/models/tiny:streamGenerateContent",
            data=body, headers={"Content-Type": "application/json"})
        from gemma_tpu.api_client import extract_text, iter_sse

        with urllib.request.urlopen(req3) as r:
            events = list(iter_sse(r))
        assert events, "at least the final SSE event"
        assert events[-1]["candidates"][0].get("finishReason") == "STOP"
        assert all(isinstance(extract_text(e), str) for e in events)
    finally:
        server.shutdown()


def test_repl_noninteractive(tmp_path, capsys, monkeypatch):
    from gemma_tpu import run as run_mod

    path = tiny_model_file(tmp_path)
    run_mod.main([
        "--weights", path, "--prompt", "hello", "--verbosity", "0",
        "--max_generated_tokens", "3", "--seq_len", "64",
        "--prefill_tbatch_size", "16",
    ])
    out = capsys.readouterr()
    assert out.out is not None  # completed without raising


def test_http_server_continuous(tiny_gemma):
    """--continuous mode: concurrent requests share decode steps."""
    import concurrent.futures

    from gemma_tpu.api_server import GemmaService, make_handler

    service = GemmaService(tiny_gemma, model_name="tiny", continuous=True)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def ask(text):
            body = json.dumps({
                "contents": [{"role": "user", "parts": [{"text": text}]}],
                "generationConfig": {"maxOutputTokens": 3},
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1beta/models/tiny:generateContent",
                data=body, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            results = list(pool.map(ask, ["hello", "world", "user model"]))
        for resp in results:
            assert resp["candidates"][0]["finishReason"] == "STOP"
            assert resp["usageMetadata"]["candidatesTokenCount"] <= 3

        # sessions fall back to the serialized path in continuous mode
        # (api_server.cc:89-97 supports KV reuse unconditionally) and KV
        # carries across turns.
        for turn in ("first", "second"):
            body = json.dumps({"contents": [{"parts": [{"text": turn}]}],
                               "sessionId": "abc",
                               "generationConfig": {"maxOutputTokens": 2},
                               }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1beta/models/tiny:generateContent",
                data=body, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                resp = json.loads(r.read())
            assert resp["sessionId"] == "abc"
            assert resp["candidates"][0]["finishReason"] == "STOP"
        assert "abc" in service.sessions
        assert service.sessions["abc"].abs_pos > 0
    finally:
        server.shutdown()
