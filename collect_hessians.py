#!/usr/bin/env python
"""Collect calibration Hessians + per-layer sensitivity coefficients.

Reference behavior: the Hessian-collection hooks of
lib/utils/data_utils.py:28-50 driven by RedPajama/RefinedWeb samplers
(:197-281), plus the shipped assets/{model}_err_coeffs.pt sensitivity
table.  Here one script produces both:

  python collect_hessians.py --model meta-llama/Llama-3.1-8B \
      --dataset wikitext2 --nsamples 64 --ctx 2048

Outputs:
  hessians/{model_key}_hessians.npz       ({i}_{qkv|o|up|down}: H)
  assets/{model_key}_err_coeffs.json      (per-linear sensitivity)
"""

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-3.1-8B")
    ap.add_argument("--dataset", default="wikitext2",
                    choices=["wikitext2", "ptb", "c4"])
    ap.add_argument("--nsamples", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--num_layers", type=int, default=-1)
    ap.add_argument("--out_dir", default="hessians")
    args = ap.parse_args()

    from qpalette_tpu.runtime.loader import MODEL_KEYS, build_dense_model
    from qpalette_tpu.runtime.evaluate import DATASET_LOADERS
    from qpalette_tpu.quant.hessian import (collect_hessians,
                                            err_coeffs_from_hessians)
    from qpalette_tpu.models.hf_weights import (find_local_checkpoint,
                                                load_dense_params,
                                                config_from_hf)

    model_key = MODEL_KEYS.get(args.model, "custom")
    ckpt = find_local_checkpoint(args.model)
    if ckpt is None:
        raise SystemExit(f"no local checkpoint for {args.model}")
    cfg = config_from_hf(ckpt)
    nl = args.num_layers if args.num_layers > 0 else cfg.num_layers
    import dataclasses
    cfg = dataclasses.replace(cfg, num_layers=nl)
    dense = load_dense_params(ckpt, cfg, num_layers=nl)
    spec, params = build_dense_model(cfg, dense)

    toks = DATASET_LOADERS[args.dataset](args.model, split="train") \
        if args.dataset == "wikitext2" else \
        DATASET_LOADERS[args.dataset](args.model)
    batches = []
    for i in range(args.nsamples // args.batch):
        s = i * args.batch * args.ctx
        e = s + args.batch * args.ctx
        if e > len(toks):
            break
        batches.append(np.asarray(toks[s:e]).reshape(args.batch, args.ctx))
    print(f"collecting over {len(batches)} batches of "
          f"({args.batch}, {args.ctx})")

    H = collect_hessians(spec, params, batches)
    os.makedirs(args.out_dir, exist_ok=True)
    hp = os.path.join(args.out_dir, f"{model_key}_hessians.npz")
    np.savez(hp, **H)
    print(f"saved {hp}")

    coeffs = err_coeffs_from_hessians(H, dense, nl)
    os.makedirs("assets", exist_ok=True)
    cp = f"assets/{model_key}_err_coeffs.json"
    json.dump(coeffs, open(cp, "w"), indent=1)
    print(f"saved {cp}")


if __name__ == "__main__":
    main()
