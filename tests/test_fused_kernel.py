"""The vectorized partition kernel (functions/fused_kernel.py) must be
BIT-IDENTICAL to the per-row reference kernels it replaces on the hot path
(detection.detect_mentions_in_tokens + featurizer.window_from_tokens +
featurizer.encode_token_lists) — same mentions, same contexts, same float
bits in every encoding."""

import numpy as np
import pandas as pd
import pytest

from incremental_entity_extraction_spark.config import DEFAULT_CONFIG as cfg
from incremental_entity_extraction_spark.fixtures import make_world
from incremental_entity_extraction_spark.functions.detection import (
    detect_mentions_in_tokens,
)
from incremental_entity_extraction_spark.functions.featurizer import (
    encode_token_lists,
    tokenize,
    window_from_tokens,
)
from incremental_entity_extraction_spark.functions.fused_kernel import (
    fused_mentions_frame,
)


def _reference_frame(pdf, known, max_tok, dim, norm):
    rows = {
        "mention_id": [], "conv_id": [], "turn_idx": [], "batch_id": [],
        "start_tok": [], "mention": [], "context_left": [], "context_right": [],
    }
    windows, weights = [], []
    for conv_id, turn_idx, batch_id, text in zip(
        pdf["conv_id"], pdf["turn_idx"], pdf["batch_id"], pdf["text"]
    ):
        toks = tokenize(text)
        spans = (
            detect_mentions_in_tokens(toks)
            if known is None
            else detect_mentions_in_tokens(toks, known)
        )
        for start, width, surface in spans:
            lt, rt = toks[:start], toks[start + width:]
            rows["mention_id"].append(f"{conv_id}:{turn_idx}:{start}")
            rows["conv_id"].append(conv_id)
            rows["turn_idx"].append(int(turn_idx))
            rows["batch_id"].append(int(batch_id))
            rows["start_tok"].append(start)
            rows["mention"].append(surface)
            rows["context_left"].append(" ".join(lt))
            rows["context_right"].append(" ".join(rt))
            wt, ww = window_from_tokens(lt, toks[start:start + width], rt, max_tok)
            windows.append(wt)
            weights.append(ww)
    out = pd.DataFrame(rows)
    if len(out) == 0:
        return None, None, None
    return out, windows, weights


def _edge_pdf():
    return pd.DataFrame(
        {
            "conv_id": ["e1", "e2", "e3", "e4", "e5", "e6"],
            "turn_idx": [0, 1, 2, 3, 4, 5],
            "batch_id": [0] * 6,
            "text": [
                "",                      # empty turn
                None,                    # null turn
                "the of and with",       # all-known → no mentions
                "zorvex",                # lone trailing 1-token mention
                "zorvex marnel qoblat",  # odd run → 2+1 split
                "a zorvex the marnel beltran of",  # two separate runs
            ],
        }
    )


@pytest.mark.parametrize("known", [None, frozenset({"the", "of", "and", "a", "with"})])
def test_bit_identity_vs_per_row_kernels(known):
    w = make_world(cfg, n_convs=30)
    pdf = pd.concat(
        [w.transcripts[["conv_id", "turn_idx", "batch_id", "text"]], _edge_pdf()],
        ignore_index=True,
    )
    ref, windows, weights = _reference_frame(
        pdf, known, cfg.max_context_tokens, cfg.dim, cfg.vector_norm
    )
    got, E_got = fused_mentions_frame(
        pdf, known, cfg.max_context_tokens, cfg.dim, cfg.vector_norm
    )
    assert len(got) == len(ref)
    for c in ref.columns:
        assert list(got[c]) == list(ref[c]), c
    E_ref = encode_token_lists(windows, cfg.dim, cfg.vector_norm, weights)
    assert E_got.dtype == np.float32
    assert np.array_equal(E_ref, E_got)  # bit-exact, not allclose
    # the returned matrix is the same data as the per-row column
    assert np.array_equal(np.stack(got["encoding"].to_numpy()), E_got)


def test_no_mentions_returns_none():
    pdf = pd.DataFrame(
        {"conv_id": ["c"], "turn_idx": [0], "batch_id": [0],
         "text": ["the of and"]}
    )
    assert fused_mentions_frame(pdf, None, 16, cfg.dim, cfg.vector_norm) is None
    empty = pdf.iloc[:0]
    assert fused_mentions_frame(empty, None, 16, cfg.dim, cfg.vector_norm) is None


def test_custom_encoder_sees_window_lists():
    """The encoder contract still receives list[list[str]] windows with the
    window_from_tokens weights, built from the slice ranges."""
    seen = {}

    def probe_encoder(windows, weights):
        seen["windows"], seen["weights"] = windows, weights
        return np.ones((len(windows), cfg.dim), dtype=np.float32)

    pdf = _edge_pdf()
    fused_mentions_frame(
        pdf, None, cfg.max_context_tokens, cfg.dim, cfg.vector_norm,
        encoder=probe_encoder,
    )
    _, exp_windows, exp_weights = _reference_frame(
        pdf, None, cfg.max_context_tokens, cfg.dim, cfg.vector_norm
    )
    assert seen["windows"] == exp_windows
    assert [[float(x) for x in w] for w in seen["weights"]] == exp_weights
