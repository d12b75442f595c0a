"""HF checkpoint loading (local safetensors) -> dense param dict.

Reference behavior: lib/utils/unsafe_import.model_from_hf_path +
transformers AutoModelForCausalLM loading.  This environment has no network
egress, so weights must already be on disk (HF cache or an explicit path);
otherwise callers fall back to random/dummy weights.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

from qpalette_tpu.models.llama import LlamaConfig


def find_local_checkpoint(name_or_path: str) -> Optional[str]:
    if os.path.isdir(name_or_path):
        return name_or_path
    cache = os.path.expanduser(
        os.environ.get("HF_HOME", "~/.cache/huggingface"))
    pat = os.path.join(cache, "hub",
                       f"models--{name_or_path.replace('/', '--')}",
                       "snapshots", "*")
    hits = sorted(glob.glob(pat))
    for h in reversed(hits):
        if glob.glob(os.path.join(h, "*.safetensors")):
            return h
    return None


def config_from_hf(path: str) -> LlamaConfig:
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    return LlamaConfig(
        vocab_size=c["vocab_size"], hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        num_kv_heads=c.get("num_key_value_heads", c["num_attention_heads"]),
        head_dim=c.get("head_dim",
                       c["hidden_size"] // c["num_attention_heads"]),
        rope_theta=c.get("rope_theta", 10000.0),
        rms_eps=c.get("rms_norm_eps", 1e-5),
        tie_embeddings=c.get("tie_word_embeddings", False))


def load_dense_params(path: str, cfg: Optional[LlamaConfig] = None,
                      num_layers: Optional[int] = None) -> dict:
    """Read safetensors shards into the loader's dense_params schema."""
    from safetensors import safe_open
    cfg = cfg or config_from_hf(path)
    nl = num_layers or cfg.num_layers

    tensors = {}
    for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf

    def get(name):
        sf = tensors[name]
        return np.asarray(sf.get_tensor(name), dtype=np.float32)

    layers = []
    for i in range(nl):
        pre = f"model.layers.{i}."
        lp = {}
        for key, hf in [
            ("self_attn.q_proj", "self_attn.q_proj.weight"),
            ("self_attn.k_proj", "self_attn.k_proj.weight"),
            ("self_attn.v_proj", "self_attn.v_proj.weight"),
            ("self_attn.o_proj", "self_attn.o_proj.weight"),
            ("mlp.gate_proj", "mlp.gate_proj.weight"),
            ("mlp.up_proj", "mlp.up_proj.weight"),
            ("mlp.down_proj", "mlp.down_proj.weight"),
        ]:
            lp[key] = get(pre + hf)
        lp["ln_attn"] = get(pre + "input_layernorm.weight")
        lp["ln_mlp"] = get(pre + "post_attention_layernorm.weight")
        layers.append(lp)

    emb = get("model.embed_tokens.weight")
    lm_head = (emb if "lm_head.weight" not in tensors
               else get("lm_head.weight"))
    return {"layers": layers, "embed": emb, "lm_head": lm_head,
            "ln_f": get("model.norm.weight")}
