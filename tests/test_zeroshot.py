"""Zero-shot harness tests with a mock tokenizer (no datasets needed)."""

import numpy as np
import pytest

from qpalette_tpu.models.llama import LlamaConfig
from qpalette_tpu.runtime.loader import build_dense_model, \
    random_dense_params
from qpalette_tpu.runtime.zeroshot import (eval_multiple_choice,
                                           loglikelihood)

CFG = LlamaConfig.tiny()


class MockTok:
    """Maps characters to token ids (mod vocab)."""

    class _Out(list):
        @property
        def input_ids(self):
            return list(self)

    def __call__(self, text, add_special_tokens=True):
        ids = [1] if add_special_tokens else []
        ids += [2 + (ord(c) % 200) for c in text]
        out = self._Out(ids)
        return out


@pytest.fixture(scope="module")
def model():
    dp = random_dense_params(CFG, seed=0)
    return build_dense_model(CFG, dp)


def test_loglikelihood_negative_and_additive(model):
    spec, params = model
    tok = MockTok()
    s1, n1 = loglikelihood(spec, params, tok, "question", " answer")
    assert s1 < 0 and n1 == len(" answer")
    # longer continuation accumulates more (more negative) mass
    s2, n2 = loglikelihood(spec, params, tok, "question",
                           " answer and then some")
    assert n2 > n1 and s2 < s1


def test_eval_multiple_choice_protocol(model):
    spec, params = model
    tok = MockTok()
    examples = [
        {"query": "Q1", "choices": [" a", " bb", " ccc"], "gold": 0},
        {"query": "Q2", "choices": [" x", " y"], "gold": 1},
    ]
    r = eval_multiple_choice(spec, params, tok, examples)
    assert set(r) == {"acc", "acc_norm", "n"}
    assert r["n"] == 2
    assert 0.0 <= r["acc"] <= 1.0 and 0.0 <= r["acc_norm"] <= 1.0
