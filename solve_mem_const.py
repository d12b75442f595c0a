#!/usr/bin/env python
"""Memory-constrained MSQ solve (reference solve_mem_const.py CLI parity).

Usage:
  python solve_mem_const.py --model meta-llama/Llama-3.1-8B \
      --target_bitwidth 3.25

Outputs msq_results/{model_key}/mem_constrained/default/{bits}bit.json
(same directory schema as the reference, JSON instead of torch .pt).
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-3.1-8B")
    ap.add_argument("--quantizer_type", default="default",
                    choices=["default"])
    ap.add_argument("--imp_key", default="err", choices=["err"])
    ap.add_argument("--target_bitwidth", type=float, default=3.25)
    ap.add_argument("--err_size", type=int, default=4096,
                    help="proxy-error matrix size (4096 = reference)")
    ap.add_argument("--err_coeffs", default="auto",
                    help="per-layer sensitivity JSON "
                    "(assets/{model}_err_coeffs.json schema; 'auto' = that "
                    "path if present, 'none' = uniform sensitivity)")
    args = ap.parse_args()

    from qpalette_tpu.runtime.loader import MODEL_KEYS, CONFIGS
    from qpalette_tpu.msq.solver import QDICT_MEM, solve_mem_constrained
    from qpalette_tpu.msq.err_tables import build_err_table
    from qpalette_tpu.msq.memmodel import calc_avg_bits

    model_key = MODEL_KEYS[args.model]
    cfg = CONFIGS[model_key]()

    qlist = list(QDICT_MEM)
    print(f"building proxy-error table ({len(qlist)} quantizers)...")
    errs = build_err_table(qlist, size=args.err_size)

    err_coeffs = None
    coeff_path = (f"assets/{model_key}_err_coeffs.json"
                  if args.err_coeffs == "auto" else args.err_coeffs)
    if args.err_coeffs != "none" and os.path.exists(coeff_path):
        err_coeffs = {k: v for k, v in json.load(open(coeff_path)).items()
                      if not k.startswith("__")}
        print(f"loaded per-layer sensitivity from {coeff_path}")

    qdict = solve_mem_constrained(cfg, qlist, errs, args.target_bitwidth,
                                  err_coeffs=err_coeffs)
    bits = calc_avg_bits(cfg, qdict)
    print(f"avg_bits: {round(bits, 3)} / {args.target_bitwidth}bit")

    out_dir = f"msq_results/{model_key}/mem_constrained/{args.quantizer_type}"
    os.makedirs(out_dir, exist_ok=True)
    out = f"{out_dir}/{args.target_bitwidth}bit.json"
    json.dump(qdict, open(out, "w"), indent=1)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
