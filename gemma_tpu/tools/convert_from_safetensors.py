"""Convert HF safetensors checkpoints to single-file `.sbs`
(maps python/convert_from_safetensors.py).

Supports Gemma2/Gemma3 text checkpoints ("model.layers...") and
PaliGemma ("language_model..." + "vision_tower...").  Writes the
reference's stacked tensor names (qkv_ein / gating_ein / att_ein, ViT
qkv_ein_w...) with the fields-serialized ModelConfig and tokenizer blob,
so the output loads in gemma_tpu AND in gemma.cpp.

    python -m gemma_tpu.tools.convert_from_safetensors \
        --model gemma2_2b --load model.safetensors[.index.json] \
        --tokenizer tokenizer.model --output out.sbs [--weight_type sfp]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from gemma_tpu.compression import Type, compress_tensor
from gemma_tpu.io.model_store import write_model
from gemma_tpu.models import configs as C


def _load_params(load_path: str) -> dict:
    import safetensors
    import torch  # noqa: F401 — bf16 checkpoints need the pt framework

    if load_path.endswith(".json"):
        with open(load_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
        files = [os.path.join(os.path.dirname(load_path), f) for f in files]
    else:
        files = [load_path]
    params = {}
    for file in files:
        with safetensors.safe_open(file, framework="pt") as f:
            for key in f.keys():
                params[key] = f.get_tensor(key)
    return params


def _np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.to(torch.float32).numpy()
    return np.asarray(t, np.float32)


# sbs_name suffix -> storage type rules (convert_from_safetensors.py
# _is_float_param/_is_bf16_param).
def _storage_type(sbs_name: str, weight_type: Type, is_vit: bool) -> Type:
    if "_ns" in sbs_name or sbs_name.endswith("_norm") \
            or "norm" in sbs_name or sbs_name.endswith("_b") \
            or "bias" in sbs_name:
        return Type.F32
    if is_vit or sbs_name in ("img_pos_emb",):
        return Type.BF16
    return weight_type


class Converter:
    def __init__(self, config: C.ModelConfig, weight_type: Type):
        self.config = config
        self.weight_type = weight_type
        self.tensors = []

    def add(self, sbs_name: str, data: np.ndarray, is_vit: bool = False,
            layer: int | None = None) -> None:
        if layer is not None:
            sbs_name = f"{sbs_name}_{layer}"
        data = np.asarray(data, np.float32)
        rows = int(np.prod(data.shape[:-1])) if data.ndim > 1 else 1
        flat = data.reshape(rows, data.shape[-1])
        type_ = _storage_type(sbs_name, self.weight_type, is_vit)
        self.tensors.append(compress_tensor(type_, sbs_name, flat))

    def write(self, path: str, tokenizer_proto: bytes | None) -> None:
        write_model(path, self.config, self.tensors,
                    tokenizer_proto=tokenizer_proto)


def convert(params: dict, config: C.ModelConfig, weight_type: Type,
            verbose: bool = True) -> Converter:
    cv = Converter(config, weight_type)
    lc = config.layer_configs[0]
    n, k, h = lc.heads, lc.kv_heads, lc.qkv_dim
    d, f = config.model_dim, lc.ff_hidden_dim

    prefix = ("language_model.model."
              if any(key.startswith("language_model.") for key in params)
              else "model.")

    def get(name: str):
        return _np(params[name])

    emb = get(prefix + "embed_tokens.weight")
    if emb.shape[0] == config.vocab_size + 64:
        emb = emb[:-64]  # HF PaliGemma pads the vocab by 64
    assert emb.shape == (config.vocab_size, d), emb.shape
    cv.add("c_embedding", emb)
    cv.add("c_final_norm", get(prefix + "norm.weight"))

    n_layers = len(config.layer_configs)
    for i in range(n_layers):
        lp = f"{prefix}layers.{i}."
        if verbose:
            print(f"layer {i}/{n_layers}")

        # qkv_ein: q [N,H,D] + interleaved (k,v) per kv head -> [(N+2K),H,D]
        q = get(lp + "self_attn.q_proj.weight").reshape(n, h, d)
        kk = get(lp + "self_attn.k_proj.weight").reshape(k, h, d)
        vv = get(lp + "self_attn.v_proj.weight").reshape(k, h, d)
        kv = np.stack([kk, vv], axis=1).reshape(2 * k, h, d)
        cv.add("qkv_ein", np.concatenate([q, kv], axis=0), layer=i)

        # att_ein: o_proj [D, N*H] -> [N, D, H]
        o = get(lp + "self_attn.o_proj.weight").reshape(d, n, h)
        cv.add("att_ein", o.transpose(1, 0, 2), layer=i)

        # gating_ein: [2, F, D] (gate then up)
        gate = get(lp + "mlp.gate_proj.weight")
        up = get(lp + "mlp.up_proj.weight")
        assert gate.shape == (f, d), gate.shape
        cv.add("gating_ein", np.stack([gate, up], axis=0), layer=i)
        cv.add("linear_w", get(lp + "mlp.down_proj.weight"), layer=i)

        cv.add("pre_att_ns", get(lp + "input_layernorm.weight"), layer=i)
        if lp + "pre_feedforward_layernorm.weight" in params:
            # Gemma2/3 naming (see reference converter comment on HF names).
            cv.add("pre_ff_ns",
                   get(lp + "pre_feedforward_layernorm.weight"), layer=i)
            cv.add("post_att_ns",
                   get(lp + "post_attention_layernorm.weight"), layer=i)
            cv.add("post_ff_ns",
                   get(lp + "post_feedforward_layernorm.weight"), layer=i)
        else:
            cv.add("pre_ff_ns",
                   get(lp + "post_attention_layernorm.weight"), layer=i)
        if lp + "self_attn.q_norm.weight" in params:  # Gemma3 qk-norm
            cv.add("query_norm", get(lp + "self_attn.q_norm.weight"), layer=i)
            cv.add("key_norm", get(lp + "self_attn.k_norm.weight"), layer=i)

    if any(key.startswith("vision_tower.") for key in params):
        _convert_vit(cv, params, config)
    return cv


def _convert_vit(cv: Converter, params: dict, config: C.ModelConfig) -> None:
    vp = "vision_tower.vision_model."
    vc = config.vit_config
    vd = vc.model_dim
    vlc = vc.layer_configs[0]
    vh, vq = vlc.heads, vlc.qkv_dim

    def get(name):
        return _np(params[name])

    # patch embedding conv kernel [D, 3, P, P] -> [D, P*P*3] (HWC patches)
    kern = get(vp + "embeddings.patch_embedding.weight")
    kern = kern.transpose(0, 2, 3, 1).reshape(vd, -1)
    cv.add("img_emb_kernel", kern, is_vit=True)
    cv.add("img_emb_bias", get(vp + "embeddings.patch_embedding.bias"))
    cv.add("img_pos_emb", get(vp + "embeddings.position_embedding.weight"),
           is_vit=True)
    cv.add("enc_norm_scale", get(vp + "post_layernorm.weight"))
    cv.add("enc_norm_bias", get(vp + "post_layernorm.bias"))

    head_prefix = "multi_modal_projector.linear.weight"
    if head_prefix in params:
        cv.add("img_head_kernel", get(head_prefix), is_vit=True)
        cv.add("img_head_bias", get("multi_modal_projector.linear.bias"))

    for i in range(len(vc.layer_configs)):
        lp = f"{vp}encoder.layers.{i}."
        q = get(lp + "self_attn.q_proj.weight").reshape(vh, vq, vd)
        kk = get(lp + "self_attn.k_proj.weight").reshape(vh, vq, vd)
        vv = get(lp + "self_attn.v_proj.weight").reshape(vh, vq, vd)
        cv.add("qkv_ein_w", np.stack([q, kk, vv], axis=1), is_vit=True,
               layer=i)
        qb = get(lp + "self_attn.q_proj.bias").reshape(vh, vq)
        kb = get(lp + "self_attn.k_proj.bias").reshape(vh, vq)
        vb = get(lp + "self_attn.v_proj.bias").reshape(vh, vq)
        cv.add("qkv_ein_b", np.stack([qb, kb, vb], axis=1), layer=i)
        o = get(lp + "self_attn.out_proj.weight")  # [vd, vh*vq]
        cv.add("attn_out_w", o, is_vit=True, layer=i)
        cv.add("attn_out_b", get(lp + "self_attn.out_proj.bias"), layer=i)
        cv.add("linear_0_w", get(lp + "mlp.fc1.weight"), is_vit=True, layer=i)
        cv.add("linear_0_b", get(lp + "mlp.fc1.bias"), layer=i)
        cv.add("linear_1_w", get(lp + "mlp.fc2.weight"), is_vit=True, layer=i)
        cv.add("linear_1_b", get(lp + "mlp.fc2.bias"), layer=i)
        cv.add("ln_0_scale", get(lp + "layer_norm1.weight"), layer=i)
        cv.add("ln_0_bias", get(lp + "layer_norm1.bias"), layer=i)
        cv.add("ln_1_scale", get(lp + "layer_norm2.weight"), layer=i)
        cv.add("ln_1_bias", get(lp + "layer_norm2.bias"), layer=i)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="config name, e.g. gemma2_2b, gemma3_1b, "
                        "paligemma2_3b_224")
    p.add_argument("--load", required=True,
                   help=".safetensors file or .index.json")
    p.add_argument("--tokenizer", default="",
                   help="sentencepiece .model file to embed")
    p.add_argument("--output", required=True)
    p.add_argument("--weight_type", default="sfp",
                   choices=["sfp", "bf16", "f32", "nuq", "i8"])
    p.add_argument("--wrapping", default="",
                   choices=["", "pt", "it", "vlm", "pali"])
    ns = p.parse_args(argv)

    config = getattr(C, f"config_{ns.model}")()
    if ns.wrapping:
        config.wrapping = {
            "pt": C.PromptWrapping.GEMMA_PT, "it": C.PromptWrapping.GEMMA_IT,
            "vlm": C.PromptWrapping.GEMMA_VLM,
            "pali": C.PromptWrapping.PALIGEMMA,
        }[ns.wrapping]
    weight_type = {"sfp": Type.SFP, "bf16": Type.BF16, "f32": Type.F32,
                   "nuq": Type.NUQ, "i8": Type.I8}[ns.weight_type]
    config.weight = weight_type

    params = _load_params(ns.load)
    cv = convert(params, config, weight_type)
    tokenizer_proto = None
    if ns.tokenizer:
        with open(ns.tokenizer, "rb") as f:
            tokenizer_proto = f.read()
    cv.write(ns.output, tokenizer_proto)
    print(f"wrote {len(cv.tensors)} tensors to {ns.output}")


if __name__ == "__main__":
    main()
