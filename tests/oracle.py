"""Pure-numpy reference transformer, written independently from
gemma_tpu/models/gemma.py against the reference's documented semantics
(SURVEY.md section 3.2).  Used as the MatMulSlow-style oracle for model
tests: scalar-ish, no jax."""

import numpy as np


def rms_norm(x, w):
    mul = 1.0 / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + 1e-6)
    return x * mul * (1.0 + w)


def gelu(x):
    return x * 0.5 * (1 + np.tanh(x * (0.797884560804236 + 0.03567740813636141 * x * x)))


def soft_cap(cap, x):
    return cap * np.tanh(x / cap) if cap else x


def rope(x, pos, inv_ts, mul=1.0):
    x = x * mul
    half = x.shape[-1] // 2
    theta = pos * inv_ts
    c, s = np.cos(theta), np.sin(theta)
    out = np.empty_like(x)
    out[..., :half] = x[..., :half] * c - x[..., half:] * s
    out[..., half:] = x[..., :half] * s + x[..., half:] * c
    return out


def bf16_round(x):
    import ml_dtypes

    return np.asarray(x, np.float32).astype(ml_dtypes.bfloat16).astype(np.float32)


class OracleModel:
    """Weights are dense f32 numpy arrays in the file layout."""

    def __init__(self, config, weights):
        self.c = config
        self.w = weights  # dict

    def embed(self, token):
        dim = self.c.model_dim
        scale = bf16_round(np.sqrt(np.float32(dim)))
        return self.w["embedding"][token].astype(np.float32) * scale

    def forward_tokens(self, tokens):
        """Full-sequence forward, returns logits [T, vocab]."""
        c = self.c
        lc = c.layer_configs[0]
        T = len(tokens)
        x = np.stack([self.embed(t) for t in tokens])  # [T, dim]
        half_dims = lc.qkv_dim // 2
        inv_ts = 1.0 / np.power(
            10000.0, 2.0 * np.arange(half_dims, dtype=np.float64) / lc.qkv_dim
        ).astype(np.float32)
        qscale = c.query_scale_value()

        for li in range(len(c.layer_configs)):
            lw = self.w["layers"][li]
            window = c.attention_window_sizes[li]
            # The engine (like the reference GEMM) feeds bf16 activations.
            xn = bf16_round(rms_norm(x, lw["pre_att_norm"]))
            q = xn @ bf16_round(lw["qkv1"]).T  # [T, heads*qkv]
            kv = xn @ bf16_round(lw["qkv2"]).T  # [T, 2*kvh*qkv]
            heads, kvh, d = lc.heads, lc.kv_heads, lc.qkv_dim
            q = q.reshape(T, heads, d)
            kv = kv.reshape(T, kvh, 2, d)
            k, v = kv[:, :, 0], kv[:, :, 1]
            if lc.use_qk_norm:
                k = rms_norm(k, lw["key_norm"])
                q = rms_norm(q, lw["query_norm"])
            for t in range(T):
                k[t] = rope(k[t], t, inv_ts)
                q[t] = rope(q[t], t, inv_ts, mul=qscale)
            att_out = np.zeros((T, heads, d), np.float32)
            groups = heads // kvh
            for t in range(T):
                start = t - min(window - 1, t)
                for h in range(heads):
                    khead = h // groups
                    scores = np.array(
                        [q[t, h] @ k[s, khead] for s in range(start, t + 1)]
                    )
                    scores = soft_cap(c.att_cap, scores)
                    e = np.exp(scores - scores.max())
                    p = e / e.sum()
                    att_out[t, h] = sum(
                        p[i] * v[start + i, khead] for i in range(len(p))
                    )
            att_sums = bf16_round(att_out.reshape(T, heads * d)) @ bf16_round(lw["att_w"]).T
            if lw.get("post_att_norm") is not None:
                att_sums = rms_norm(att_sums, lw["post_att_norm"])
            x = x + att_sums

            yn = bf16_round(rms_norm(x, lw["pre_ffw_norm"]))
            c1 = yn @ bf16_round(lw["gating1"]).T
            c2 = yn @ bf16_round(lw["gating2"]).T
            ffw = bf16_round(gelu(c1) * c2) @ bf16_round(lw["linear"]).T
            if lw.get("post_ffw_norm") is not None:
                ffw = rms_norm(ffw, lw["post_ffw_norm"])
            x = x + ffw

        xf = bf16_round(rms_norm(x, self.w["final_norm"]))
        logits = xf @ bf16_round(self.w["embedding"]).T.astype(np.float32)
        return soft_cap(self.c.final_cap, logits)
