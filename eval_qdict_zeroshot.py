#!/usr/bin/env python
"""Zero-shot eval of a quantized model (reference eval_qdict_zeroshot.py).

Tasks: arc_easy, arc_challenge, piqa, winogrande, hellaswag — scored with
the native loglikelihood harness (qpalette_tpu.runtime.zeroshot) since
lm-eval isn't available here.  Requires local HF weights + datasets cache.
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="meta-llama/Llama-3.1-8B")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--qdict_path", default=None)
    ap.add_argument("--quantizer_str", default=None)
    ap.add_argument("--tasks", default="arc_easy,arc_challenge,piqa,"
                                       "winogrande,hellaswag")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--save_dir", default="quant_results")
    ap.add_argument("--impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--num_layers", type=int, default=-1)
    args = ap.parse_args()

    from transformers import AutoTokenizer
    from qpalette_tpu.runtime.loader import (MODEL_KEYS,
                                             build_quantized_model)
    from qpalette_tpu.runtime.zeroshot import (eval_multiple_choice,
                                               task_examples)
    from qpalette_tpu.models.hf_weights import (find_local_checkpoint,
                                                load_dense_params,
                                                config_from_hf)

    model_key = MODEL_KEYS.get(args.model, "custom")
    qdict = args.quantizer_str
    if qdict is None:
        qdict = json.load(open(args.qdict_path))
        qdict = {k: tuple(v) if isinstance(v, list) else v
                 for k, v in qdict.items()}

    ckpt = find_local_checkpoint(args.model)
    if ckpt is None:
        raise SystemExit(f"no local checkpoint for {args.model}")
    cfg = config_from_hf(ckpt)
    nl = args.num_layers if args.num_layers > 0 else cfg.num_layers
    dense = load_dense_params(ckpt, cfg, num_layers=nl)
    spec, params = build_quantized_model(
        cfg, qdict, model_key=model_key, save_dir=args.save_dir,
        seed=args.seed, dense_params=dense, impl=args.impl, num_layers=nl)

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    results = {}
    for task in args.tasks.split(","):
        examples = task_examples(task, limit=args.limit)
        r = eval_multiple_choice(spec, params, tokenizer, examples)
        results[task] = r
        print(f"{task}: acc={r['acc']:.4f} acc_norm={r['acc_norm']:.4f} "
              f"(n={r['n']})", flush=True)

    if args.qdict_path:
        out = args.qdict_path.replace(".json", "_zeroshot.json")
        json.dump(results, open(out, "w"), indent=1)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
