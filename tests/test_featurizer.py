"""Unit tests for the deterministic featurizer (encoder contract)."""

import numpy as np

from incremental_entity_extraction_spark.functions.featurizer import (
    build_entity_window,
    build_mention_window,
    encode_token_lists,
    token_vector,
    tokenize,
)


def test_tokenize_lowercase_alnum():
    assert tokenize("Hello, World 42!") == ["hello", "world", "42"]
    assert tokenize(None) == []
    assert tokenize("") == []


def test_token_vector_deterministic_and_platform_stable():
    v1 = token_vector("spark", 64)
    v2 = token_vector("spark", 64)
    np.testing.assert_array_equal(v1, v2)
    assert v1.dtype == np.float32
    assert v1.shape == (64,)
    # regression pin: first component must never drift across versions
    assert abs(float(v1[0]) - float(token_vector("spark", 64)[0])) == 0.0
    assert not np.allclose(v1, token_vector("sparks", 64))


def test_token_vector_any_dim():
    assert token_vector("x", 7).shape == (7,)
    assert token_vector("x", 200).shape == (200,)
    # prefix property is NOT required, but values must be in [-1, 1)
    v = token_vector("x", 200)
    assert np.all(v >= -1.0) and np.all(v < 1.0)


def test_encode_norm_and_empty():
    out = encode_token_lists([["a", "b"], []], dim=32, norm=10.0)
    assert out.shape == (2, 32)
    assert abs(np.linalg.norm(out[0]) - 10.0) < 1e-3
    assert np.linalg.norm(out[1]) == 0.0


def test_encode_weights_shift_vector_toward_focus_token():
    base = encode_token_lists([["focus", "ctx"]], 64, 10.0, [[1.0, 1.0]])[0]
    heavy = encode_token_lists([["focus", "ctx"]], 64, 10.0, [[8.0, 1.0]])[0]
    focus = encode_token_lists([["focus"]], 64, 10.0)[0]
    assert float(heavy @ focus) > float(base @ focus)


def test_mention_window_quota_and_spillover():
    toks, weights = build_mention_window(
        "l1 l2 l3 l4 l5 l6 l7 l8 l9 l10", "m1 m2", "r1 r2", max_tokens=10
    )
    # budget 8: right has only 2 -> left gets 6 (spillover)
    assert toks == ["l5", "l6", "l7", "l8", "l9", "l10", "m1", "m2", "r1", "r2"]
    assert weights[6] == weights[7] != 1.0
    assert all(w == 1.0 for w in weights[:6] + weights[8:])


def test_entity_window_truncation():
    toks, weights = build_entity_window("t1 t2", " ".join(f"d{i}" for i in range(40)), 8)
    assert len(toks) == 8 and toks[:2] == ["t1", "t2"]
    assert weights[0] != 1.0 and weights[2] == 1.0
