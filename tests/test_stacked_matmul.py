"""Stacked [L, ...] weight GEMMs (scalar-prefetch layer select) vs the
per-layer kernels — bit-strict, every codec, fused stages included.

The scan-over-layers decode (engine/scan_decode.py) passes whole stacked
weights into the Pallas kernels and selects the layer in the block index
maps (ops/matmul.py:_b_inputs_stacked); these tests pin that the selected
layer's result is IDENTICAL to running that layer's unstacked tensor,
with and without the fused prologue-norm / epilogue-norm / residual-add
stages, and under lax.scan (the deployment shape).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.compression.registry import Type, compress_tensor
from gemma_tpu.ops.matmul import (
    QuantTensor,
    gated_ffn,
    matmul,
    quant_tensor_from_packed,
    quant_tensor_i4,
    stack_quant_tensors,
    take_layer,
)

L, N, K, M = 3, 256, 512, 8
RNG = np.random.default_rng(0)
A = jnp.asarray(RNG.standard_normal((M, K)), jnp.bfloat16)


def _mk(kind, vals):
    if kind == "bf16":
        return QuantTensor("bf16", vals.shape, 1.0,
                           {"w": jnp.asarray(vals, jnp.bfloat16)})
    if kind == "i8":
        return quant_tensor_from_packed(
            compress_tensor(Type.I8, "w", vals.astype(np.float32)))
    if kind == "i4":
        return quant_tensor_i4(vals.astype(np.float32))
    if kind == "sfp":
        qt = quant_tensor_from_packed(
            compress_tensor(Type.SFP, "w", vals.astype(np.float32)))
        return dataclasses.replace(qt, scale=1.0)
    if kind == "nuq4":
        qt = quant_tensor_from_packed(
            compress_tensor(Type.NUQ, "w", vals.astype(np.float32)), "nuq4")
        return dataclasses.replace(qt, scale=1.0)
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["bf16", "sfp", "i8", "i4", "nuq4"])
def test_stacked_matmul_bitmatches_per_layer(kind):
    qts = [_mk(kind, RNG.standard_normal((N, K))) for _ in range(L)]
    st = stack_quant_tensors(qts)
    norm = jnp.asarray(RNG.standard_normal((K,)), jnp.float32)
    post = jnp.asarray(RNG.standard_normal((N,)) * 0.1, jnp.float32)
    addm = jnp.asarray(RNG.standard_normal((M, N)), jnp.float32)
    for l in range(L):
        ref = matmul(A, qts[l])
        got = matmul(A, st, layer=jnp.int32(l))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        # Fused prologue + epilogue + residual, all at once.
        ref = matmul(A, qts[l], prologue_norm=norm, epilogue_norm=post,
                     add=addm)
        got = matmul(A, st, layer=jnp.int32(l), prologue_norm=norm,
                     epilogue_norm=post, add=addm)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        # take_layer (the compile-failure fallback) is exact too.
        tl = matmul(A, take_layer(st, jnp.int32(l)))
        np.testing.assert_array_equal(np.asarray(matmul(A, qts[l])),
                                      np.asarray(tl))


@pytest.mark.parametrize("kind", ["i8", "i4"])
def test_stacked_gated_ffn_bitmatches(kind):
    q1 = [_mk(kind, RNG.standard_normal((N, K))) for _ in range(L)]
    q2 = [_mk(kind, RNG.standard_normal((N, K))) for _ in range(L)]
    s1, s2 = stack_quant_tensors(q1), stack_quant_tensors(q2)
    norm = jnp.asarray(RNG.standard_normal((K,)), jnp.float32)
    for l in range(L):
        ref = gated_ffn(A, q1[l], q2[l], prologue_norm=norm,
                        out_dtype=jnp.bfloat16)
        got = gated_ffn(A, s1, s2, prologue_norm=norm,
                        out_dtype=jnp.bfloat16, layer=jnp.int32(l))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_stacked_matmul_under_scan():
    st = stack_quant_tensors(
        [_mk("i8", RNG.standard_normal((N, K))) for _ in range(L)])
    refs = jnp.stack([matmul(A, take_layer(st, jnp.int32(l)))
                      for l in range(L)])

    def body(c, i):
        return c, matmul(A, st, layer=i)

    _, outs = jax.lax.scan(body, 0, jnp.arange(L, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(refs), np.asarray(outs))


def test_stack_rejects_heterogeneous_scales():
    vals = RNG.standard_normal((N, K))
    qts = [quant_tensor_from_packed(
        compress_tensor(Type.SFP, "w", (vals * s).astype(np.float32)))
        for s in (1.0, 2.0)]
    with pytest.raises(ValueError, match="cannot stack"):
        stack_quant_tensors(qts)


def test_stack_folds_bf16_scales():
    vals = RNG.standard_normal((N, K)).astype(np.float32)
    qts = [QuantTensor("bf16", (N, K), s,
                       {"w": jnp.asarray(vals, jnp.bfloat16)})
           for s in (1.0, 2.0)]
    st = stack_quant_tensors(qts)
    assert st.scale == 1.0
    # layer 1's folded weights = 2 * layer 0's (exact: powers of two).
    np.testing.assert_array_equal(
        np.asarray(st.arrays["w"][1].astype(jnp.float32)),
        np.asarray(st.arrays["w"][0].astype(jnp.float32)) * 2.0)
