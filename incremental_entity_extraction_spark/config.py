"""Pipeline configuration constants.

Operating constants mirror the reference deployment where they are
dimensionless decisions (top_k, thresholds), and are re-derived where they
depend on the embedding space:

* retrieval ``top_k=10``            — reference scripts/eval_kbp.py:380
* NIL threshold 0.5 on P(not-NIL)   — reference scripts/eval_kbp.py:489-491
* greedy clustering threshold in dot-product space
  80.98388671875                    — reference pipeline/docker-compose.yml:80

The reference's BLINK vectors are 1024-d unnormalized BERT states; ours are
``dim``-d deterministic hash features scaled to L2 norm ``vector_norm`` = 10,
so a dot product equals ``100 * cosine``.  The reference greedy threshold
80.98... therefore keeps its meaning as "cosine similarity > 0.8098".
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- embedding space -------------------------------------------------
    dim: int = 64                     # 1024 in the reference (docker-compose.yml:43)
    vector_norm: float = 10.0         # L2 norm of every encoding => dot = 100*cos

    # --- retrieval --------------------------------------------------------
    top_k: int = 10                   # eval_kbp.py:380

    # --- NIL prediction (StandardScaler + LogisticRegression, closed form) -
    # Deployed reference model uses features (max_bi, secondiff)
    # (docker-compose.yml:54).  Constants below are the fixed, seeded
    # stand-in for the trained scaler/weights; calibrated on the synthetic
    # fixture so that in-KB mentions score > 0.5 and out-of-KB mentions < 0.5.
    nil_threshold: float = 0.5        # eval_kbp.py:489
    nil_mu_max_bi: float = 70.0
    nil_sigma_max_bi: float = 15.0
    nil_mu_secondiff: float = 12.0
    nil_sigma_secondiff: float = 12.0
    nil_w_max_bi: float = 3.0
    nil_w_secondiff: float = 0.8
    nil_bias: float = 0.0

    # --- NIL clustering ----------------------------------------------------
    greedy_threshold: float = 80.98388671875   # docker-compose.yml:80, dot space

    # --- tokenization windows (data_process.py:26-69 analogue) -------------
    max_context_tokens: int = 16      # total window budget for mention encoding
    max_entity_tokens: int = 32       # title + descr budget (max_cand_length)
    max_title_len: int = 100          # postgres_populate_entities.py:11

    # --- KB layout ----------------------------------------------------------
    ro_indexer_id: int = 10           # read-only KB index id (docker-compose.yml:43)
    rw_indexer_id: int = 20           # read-write "new entities" index id

    # --- misc ----------------------------------------------------------------
    seed: int = 1234                  # create_dataset.Rmd:17-35 uses seed 1234
    recall_ks: tuple = (1, 2, 3, 5, 10)   # eval_kbp.py:412 (k<=top_k subset)


DEFAULT_CONFIG = PipelineConfig()
