"""Zero-shot multiple-choice evaluation (lm-eval-style).

Reference behavior: eval_qdict_zeroshot.py:69-97 — lm-eval
simple_evaluate on arc_easy / arc_challenge / piqa / winogrande /
hellaswag, acc + acc_norm.

lm-eval isn't available in this environment, so this is a minimal native
reimplementation of its loglikelihood protocol: for each question, score
every answer continuation by summed token log-probability (and
length-normalized for acc_norm), pick the argmax.  Task data comes from the
local HF datasets cache (no egress).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from qpalette_tpu.models import llama


@functools.partial(jax.jit, static_argnames=("spec",))
def _token_logprobs(spec, params, tokens):
    """tokens (B, S) -> per-position next-token logprob (B, S-1)."""
    logits = llama.forward(spec, params, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)
    tgt = tokens[:, 1:]
    return jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]


def loglikelihood(spec, params, tokenizer, context: str, continuation: str,
                  max_len: int = 1024) -> Tuple[float, int]:
    """Summed logprob of `continuation` given `context` (lm-eval protocol:
    continuation tokens only are scored)."""
    ctx_ids = tokenizer(context, add_special_tokens=True).input_ids
    cont_ids = tokenizer(continuation, add_special_tokens=False).input_ids
    ids = (ctx_ids + cont_ids)[-max_len:]
    n_cont = len(cont_ids)
    arr = jnp.asarray(np.asarray(ids)[None, :], jnp.int32)
    lp = np.asarray(_token_logprobs(spec, params, arr))[0]
    return float(lp[-n_cont:].sum()), n_cont


def eval_multiple_choice(spec, params, tokenizer,
                         examples: List[dict]) -> Dict[str, float]:
    """examples: [{"query": str, "choices": [str], "gold": int}].

    Returns acc and acc_norm (byte-length normalized, as lm-eval)."""
    correct = correct_norm = 0
    for ex in examples:
        scores, norm_scores = [], []
        for ch in ex["choices"]:
            s, _ = loglikelihood(spec, params, tokenizer, ex["query"], ch)
            scores.append(s)
            norm_scores.append(s / max(len(ch.encode()), 1))
        if int(np.argmax(scores)) == ex["gold"]:
            correct += 1
        if int(np.argmax(norm_scores)) == ex["gold"]:
            correct_norm += 1
    n = len(examples)
    return {"acc": correct / n, "acc_norm": correct_norm / n, "n": n}


# ---------------------------------------------------------------------------
# task loaders (local HF datasets cache)
# ---------------------------------------------------------------------------

def _load(name, *cfg, split="validation"):
    from datasets import load_dataset
    return load_dataset(name, *cfg, split=split)


def task_examples(task: str, limit=None) -> List[dict]:
    """Convert the reference's four tasks to the generic format."""
    if task in ("arc_easy", "arc_challenge"):
        cfg = "ARC-Easy" if task == "arc_easy" else "ARC-Challenge"
        ds = _load("allenai/ai2_arc", cfg, split="test")
        out = []
        for ex in ds:
            labels = ex["choices"]["label"]
            gold = labels.index(ex["answerKey"])
            out.append({"query": f"Question: {ex['question']}\nAnswer:",
                        "choices": [" " + t for t in ex["choices"]["text"]],
                        "gold": gold})
    elif task == "piqa":
        ds = _load("piqa", split="validation")
        out = [{"query": f"Question: {ex['goal']}\nAnswer:",
                "choices": [" " + ex["sol1"], " " + ex["sol2"]],
                "gold": ex["label"]} for ex in ds]
    elif task == "winogrande":
        ds = _load("winogrande", "winogrande_xl", split="validation")
        out = []
        for ex in ds:
            pron = ex["sentence"].index("_")
            ctx = ex["sentence"][:pron]
            post = ex["sentence"][pron + 1:]
            out.append({"query": ctx,
                        "choices": [ex["option1"] + post,
                                    ex["option2"] + post],
                        "gold": int(ex["answer"]) - 1})
    elif task == "hellaswag":
        ds = _load("hellaswag", split="validation")
        out = [{"query": ex["ctx"],
                "choices": [" " + e for e in ex["endings"]],
                "gold": int(ex["label"])} for ex in ds]
    else:
        raise ValueError(task)
    if limit:
        out = out[:limit]
    return out
