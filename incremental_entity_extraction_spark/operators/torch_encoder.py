"""M4 real-model encoder adapter — the documented integration point for a
torch biencoder behind the pluggable-encoder contract
(operators/fused.detect_encode_retrieve ``encoder=``).

Reference: BLINK BERT-large towers served over HTTP
(pipeline/biencoder/main.py:41-99, 1024-d unnormalized states).  In this
engine an encoder is a picklable callable

    encoder(windows: list[list[str]], weights: list[list[float]])
        -> np.ndarray[n, dim] float32

run executor-side per Arrow batch.  This module shows the executor-local
singleton pattern a heavy model needs: the model loads ONCE per Python
worker process (module-global), not per batch and never on the driver; the
callable captures only strings/numbers so pickling ships no weights.

torch/transformers are not installed in this environment, so construction
raises ImportError with instructions — the deterministic hash featurizer
(the default encoder) is the drop-in stand-in; tests prove the contract
plumbing with a custom pure-NumPy encoder (tests/test_encoder_contract.py).
"""

from __future__ import annotations

import numpy as np

# executor-local model cache: {(model_name, device): model}
_MODELS: dict = {}


def make_torch_encoder(
    model_name: str,
    dim: int,
    vector_norm: float = 10.0,
    device: str = "cpu",
    batch_size: int = 64,
):
    """Build an encoder callable backed by a sentence-transformers/torch
    model.  Raises ImportError where torch is absent (this sandbox)."""
    try:
        import torch  # noqa: F401

        # fail at CONSTRUCTION, on the driver — _encode needs this on every
        # executor, and a deferred ImportError there costs a launched job
        import sentence_transformers  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "torch is not installed in this environment. Install torch + "
            "sentence-transformers to plug a real biencoder into "
            "detect_encode_retrieve(encoder=...); until then the default "
            "deterministic hash featurizer is the drop-in stand-in with the "
            "same contract (L2 norm = cfg.vector_norm so dot thresholds "
            "keep meaning)."
        ) from e

    def _encode(windows, weights):
        import torch

        from sentence_transformers import SentenceTransformer

        key = (model_name, device)
        if key not in _MODELS:
            # executor-local singleton: load once per worker process.
            # SentenceTransformer resolves HF hub names / local dirs and
            # provides .encode(); raw torch.load() does neither.
            _MODELS[key] = SentenceTransformer(model_name, device=device)
        model = _MODELS[key]
        texts = [" ".join(w) for w in windows]
        out = np.empty((len(texts), dim), dtype=np.float32)
        with torch.inference_mode():
            for i in range(0, len(texts), batch_size):
                emb = model.encode(
                    texts[i : i + batch_size],
                    batch_size=batch_size,
                    convert_to_numpy=True,
                    normalize_embeddings=False,
                )
                out[i : i + batch_size] = np.asarray(emb, dtype=np.float32)
        # contract: L2-norm to vector_norm so dot = norm² · cosine
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms * vector_norm

    return _encode
