#!/usr/bin/env python
"""Quality stack-up regression: CE/logit deltas across the numeric paths
the headline bench config stacks (round-4 VERDICT missing #1 / weak #6).

The container has no model weights, so absolute perplexity is out of
reach; what IS measurable — and what the bench config actually changed —
is the NUMERIC path: int8 activations (pallas_a8) on the decoder
projections, and the 16/8/4-bit lm_head variants.  This script builds a
fixed-seed dummy-quantized model at the largest in-container scale
(Llama-3.2-1B config shapes by default) and measures, on a fixed token
sequence:

  * teacher-forced CE under every {impl} x {lm_head_bits} combination
  * max/mean |logit delta| vs the exact-decode bf16-head reference

Deltas are pinned in assets/quality_stackup.json; tests assert re-runs
stay within bounds (tiny config on CPU; the committed asset is from the
real chip at 1B scale).

Usage: python scripts/quality_stackup.py [--config 3_1b|tiny]
       [--out assets/quality_stackup.json] [--layers N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_stackup(config="3_1b", layers=None, seq=96, seed=0):
    import jax
    import jax.numpy as jnp
    from qpalette_tpu.models.llama import LlamaConfig, forward
    from qpalette_tpu.runtime.loader import build_quantized_model, LAYER_KEYS

    cfg = {"3_1b": LlamaConfig.llama32_1b,
           "3_8b": LlamaConfig.llama31_8b,
           "tiny": LlamaConfig.tiny}[config]()
    nl = layers or cfg.num_layers

    rng = np.random.default_rng(seed)
    toks = rng.integers(0, cfg.vocab_size, (1, seq), dtype=np.int32)
    toks = jnp.asarray(toks)

    def mixes():
        yield "tcq2s_bench", {
            f"{i}_{k}": ("tcq2s_8_none_0.9" if k == "mlp.down_proj"
                         else "tcq2s_6_none_0.9")
            for i in range(nl) for k in LAYER_KEYS}
        yield "tcomb_325", {
            f"{i}_{k}": "tcomb_6_7_0.5_none_0.9"
            for i in range(nl) for k in LAYER_KEYS}

    def ce_of(logits, toks):
        lg = logits[:, :-1].astype(jnp.float32)
        tg = toks[:, 1:]
        ls = jax.nn.log_softmax(lg, axis=-1)
        return float(-jnp.mean(
            jnp.take_along_axis(ls, tg[..., None], axis=-1)))

    results = {"config": config, "layers": nl, "seq": seq, "seed": seed}
    for mix_name, qd in mixes():
        sub = {}
        ref_logits = None
        # (impl, lm_bits): exact bf16-head reference first
        cases = [("pallas", 16), ("pallas_a8", 16), ("pallas_a8", 8),
                 ("pallas_a8", 4), ("pallas", 4)]
        if mix_name == "tcomb_325":
            cases = [("pallas", 16), ("pallas", 8), ("pallas", 4)]
        for impl, lmb in cases:
            spec, params = build_quantized_model(
                cfg, qd, model_key=f"qs_{mix_name}", dummy=True,
                impl=impl, num_layers=nl, lm_head_bits=lmb, seed=seed,
                save_dir="/tmp/qpt_stackup")
            logits = np.asarray(forward(spec, params, toks)
                                .astype(jnp.float32))
            ce = ce_of(jnp.asarray(logits), toks)
            key = f"{impl}_lm{lmb}"
            entry = {"ce": round(ce, 5)}
            if ref_logits is None:
                ref_logits = logits
                ref_ce = ce
            scale = float(np.abs(ref_logits).max())
            entry["max_logit_delta_rel"] = round(
                float(np.abs(logits - ref_logits).max()) / scale, 5)
            entry["mean_logit_delta_rel"] = round(
                float(np.abs(logits - ref_logits).mean()) / scale, 6)
            entry["ce_delta"] = round(ce - ref_ce, 5)
            sub[key] = entry
            print(f"{mix_name} {key}: CE {ce:.4f} "
                  f"(d={entry['ce_delta']:+.4f}), "
                  f"max|dlogit|/|ref| {entry['max_logit_delta_rel']:.4f}",
                  flush=True)
        results[mix_name] = sub
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3_1b",
                    choices=["3_1b", "3_8b", "tiny"])
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--seq", type=int, default=96)
    ap.add_argument("--out", default="assets/quality_stackup.json")
    args = ap.parse_args()
    res = run_stackup(args.config, args.layers, args.seq)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump(res, open(args.out, "w"), indent=1)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
