"""Perplexity evaluation harness.

Reference behavior: eval_qdict.py:17-38 — per-sample forward over
ctx-size windows of the test stream, mean cross-entropy, ppl = exp(loss);
results cached next to the qdict (:79-120).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from qpalette_tpu.models import llama


@functools.partial(jax.jit, static_argnames=("spec",))
def ce_loss(spec, params, tokens):
    """tokens (B, S) -> mean next-token cross-entropy (matches the
    reference's shift-logits CE, eval_qdict.py:28-32)."""
    logits = llama.forward(spec, params, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def eval_ppl(spec, params, token_stream: np.ndarray, ctx_size: int = 8192,
             progress: bool = True):
    """token_stream: flat int array.  Returns (ppl, avg_loss)."""
    n = len(token_stream) // ctx_size
    total = 0.0
    for i in range(n):
        chunk = token_stream[i * ctx_size:(i + 1) * ctx_size]
        loss = float(ce_loss(spec, params,
                             jnp.asarray(chunk[None, :], jnp.int32)))
        total += loss
        if progress:
            print(f"  [{i + 1}/{n}] avg_loss={total / (i + 1):.4f}",
                  flush=True)
    avg = total / max(n, 1)
    return float(np.exp(avg)), avg


def wikitext2_tokens(tokenizer_name: str = "meta-llama/Llama-3.1-8B",
                     split: str = "test"):
    """Load + tokenize WikiText-2 (reference lib/utils/gptq_data_utils.py).

    Requires local HF cache (no network egress in this environment); raises
    a clear error otherwise so callers can fall back to synthetic streams.
    """
    from datasets import load_dataset  # type: ignore
    from transformers import AutoTokenizer
    ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    tok = AutoTokenizer.from_pretrained(tokenizer_name)
    text = "\n\n".join(ds["text"])
    return np.asarray(tok(text, return_tensors="np").input_ids[0])
