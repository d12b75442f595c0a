#!/usr/bin/env python
"""Generate assets/{model_key}_err_coeffs.json via the documented
calibration pipeline on SYNTHETIC data (random dense weights + random
token stream), locking the asset schema the MSQ solvers consume.

Reference counterpart: assets/3_8b_err_coeffs.pt (225 measured entries,
consumed at solve_mem_const.py:137-139).  Real-calibration values need
local HF weights + a calibration set (collect_hessians.py); this runs the
same formula — coeff = tr(H_group)/n · mean(W²) — through
quant/hessian.collect_group_energy on a random model, and marks the
output "__source__": "synthetic" so no one mistakes it for measured data.

Runs on CPU (bf16 dense forward; ~10 min for 8B on 2 cores).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-3.1-8B")
    ap.add_argument("--tokens", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    from qpalette_tpu.runtime.loader import (MODEL_KEYS, CONFIGS,
                                             build_dense_model,
                                             random_dense_params)
    from qpalette_tpu.quant.hessian import (collect_group_energy,
                                            err_coeffs_from_energy)

    model_key = MODEL_KEYS[args.model]
    cfg = CONFIGS[model_key]()
    rng = np.random.default_rng(args.seed)
    print(f"building random dense {model_key}...", flush=True)
    dp = random_dense_params(cfg, seed=args.seed)
    spec, params = build_dense_model(cfg, dp)

    nb = max(1, args.tokens // (args.batch * args.seqlen))
    batches = [rng.integers(0, cfg.vocab_size,
                            (args.batch, args.seqlen)).astype(np.int32)
               for _ in range(nb)]
    t0 = time.time()
    energy = collect_group_energy(spec, params, batches)
    print(f"energy pass: {time.time() - t0:.0f}s "
          f"({nb * args.batch * args.seqlen} tokens)", flush=True)
    coeffs = err_coeffs_from_energy(energy, dp, cfg.num_layers)
    coeffs["__source__"] = "synthetic"
    coeffs["__note__"] = ("random weights + random tokens; schema-locking "
                          "stand-in for measured calibration "
                          "(collect_hessians.py)")
    out = f"assets/{model_key}_err_coeffs.json"
    os.makedirs("assets", exist_ok=True)
    json.dump(coeffs, open(out, "w"), indent=1)
    print(f"saved {len(coeffs) - 2} coefficients to {out}")


if __name__ == "__main__":
    main()
