#!/usr/bin/env python
"""Quantize model layers to per-layer artifacts (reference quantize_layer.py).

Usage:
  # quantize every projection of a model with one scheme
  python quantize_layer.py --model meta-llama/Llama-3.1-8B \
      --quantizer_str tcomb_6_7_0.5_none_0.9
  # or per-layer from a solved qdict
  python quantize_layer.py --model ... --qdict_path msq_results/....json

Artifacts land in quant_results/{model_key}/left_only_seed{seed}_cache/
{quantizer_str}/{i}_{layer_key}.npz and are skipped if present (resume at
layer granularity, reference quantize_layer.py:139-147).  Hessian-aware
quantizers ("..._hess_...") consume --hess_path (npz of {i}_{group}: H)
produced by collect_hessians.
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-3.1-8B")
    ap.add_argument("--quantizer_str", default=None)
    ap.add_argument("--qdict_path", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save_dir", default="quant_results")
    ap.add_argument("--hess_path", default=None)
    ap.add_argument("--num_layers", type=int, default=-1)
    ap.add_argument("--layers", default=None,
                    help="comma list of layer indices (default: all)")
    args = ap.parse_args()

    import numpy as np
    from qpalette_tpu.runtime.loader import (MODEL_KEYS, LAYER_KEYS, su_for,
                                             artifact_path)
    from qpalette_tpu.quant.incoherent import (quantize_linear,
                                               save_artifact)
    from qpalette_tpu.quant.hessian import HESSKEY
    from qpalette_tpu.models.hf_weights import (find_local_checkpoint,
                                                load_dense_params,
                                                config_from_hf)

    model_key = MODEL_KEYS.get(args.model, "custom")
    ckpt = find_local_checkpoint(args.model)
    if ckpt is None:
        raise SystemExit(f"no local checkpoint for {args.model}")
    cfg = config_from_hf(ckpt)
    nl = args.num_layers if args.num_layers > 0 else cfg.num_layers
    dense = load_dense_params(ckpt, cfg, num_layers=nl)

    if args.qdict_path:
        qdict = json.load(open(args.qdict_path))
    else:
        assert args.quantizer_str
        qdict = {f"{i}_{k}": args.quantizer_str
                 for i in range(nl) for k in LAYER_KEYS}

    hess = None
    if args.hess_path:
        hess = dict(np.load(args.hess_path))

    layer_ids = ([int(x) for x in args.layers.split(",")]
                 if args.layers else range(nl))
    for i in layer_ids:
        for key in LAYER_KEYS:
            v = qdict[f"{i}_{key}"]
            qstr = v[0] if isinstance(v, (list, tuple)) else v
            path = artifact_path(args.save_dir, model_key, args.seed, qstr,
                                 i, key)
            if os.path.exists(path):
                print(f"skip {i}_{key} ({qstr}): exists")
                continue
            H = hess.get(f"{i}_{HESSKEY[key]}") if hess else None
            su = su_for(cfg, i, key, args.seed)
            print(f"quantizing {i}_{key} with {qstr}", flush=True)
            art = quantize_linear(dense["layers"][i][key], qstr, SU=su,
                                  H=H, seed=args.seed)
            save_artifact(art, path)
            print(f"  err={art['meta']['err']:.5f} -> {path}", flush=True)


if __name__ == "__main__":
    main()
