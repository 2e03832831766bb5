"""Independent numpy derivation of the ``ann_ivf_kmeans_recall`` pinned-hit
table (VERDICT r06 ask #8).

``plans/pipeline_ops._IVF_PINNED_HITS`` pins, per shipped corpus size, the
per-query overlap between the Lloyd-refined IVF top-10 and the brute-force
top-10. The pipeline is deterministic but iterative (not SQL-expressible),
so the registered oracle replays the pinned table — which until this test
was ENGINE-derived, i.e. self-referential. This module re-derives every
pinned row from the parquet fixtures with a from-scratch numpy
implementation of the identical contract:

* seeds = the 16 lowest-id vectors, centroid ids 1..16 in id order;
* 5 fixed Lloyd rounds: assignment by 6dp-HALF_UP-rounded cosine with ties
  to the lowest centroid id, arithmetic-mean update, L2 re-normalization,
  empty cells dropped (engine: ``operators/similarity.py:kmeans_centroids``);
* corpus assignment keep=1, query probe keep=4 over the refined centroids,
  candidate = corpus member of any probed cell minus self, top-10 by
  (rounded cosine DESC, neighbor_id) (engine: ``similarity.ivf_topk``);
* exact = brute-force top-10 under the same ordering (engine:
  ``similarity.brute_force_topk``).

Only numpy touches the data here — no Spark, no engine imports beyond the
pinned table itself — so agreement means the table is a derived quantity,
not an asserted one.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from zarr_datafusion_search_spark.plans.pipeline_ops import _IVF_PINNED_HITS

TESTDATA = "/root/testdata"
SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]

N_CENTROIDS = 16
N_ITER = 5
N_PROBE = 4
K = 10


def _round6(x: np.ndarray) -> np.ndarray:
    """Spark's F.round on doubles = BigDecimal HALF_UP (away from zero),
    not numpy's round-half-even."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    na = np.linalg.norm(a, axis=1, keepdims=True)
    nb = np.linalg.norm(b, axis=1, keepdims=True)
    return _round6((a @ b.T) / (na * nb.T))


def _lloyd_centroids(x: np.ndarray) -> np.ndarray:
    """5 deterministic spherical-Lloyd rounds from the lowest-id seeds;
    returns the refined centroid matrix ordered by centroid id (empty
    cells dropped, as the engine's groupBy does)."""
    cents = x[:N_CENTROIDS].astype(np.float64)
    for _ in range(N_ITER):
        cos = _cosine_matrix(x, cents)
        assign = np.argmax(cos, axis=1)  # first max = lowest centroid id
        kept = []
        for c in range(cents.shape[0]):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                kept.append(m / np.linalg.norm(m))
        cents = np.asarray(kept)
    return cents


def _topk_ids(cos_row: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """ids of the k best by (cosine DESC, id ASC) — lexsort is stable so
    sorting by (-cos, id) reproduces the engine's row_number ordering."""
    order = np.lexsort((ids, -cos_row))
    return ids[order[:k]]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_pinned_ivf_hits_rederived_from_numpy(sf):
    emb_path = os.path.join(TESTDATA, sf, "embeddings.parquet")
    ev_path = os.path.join(TESTDATA, sf, "events.parquet")
    t = pq.read_table(emb_path)
    key = pq.read_table(ev_path).num_rows
    assert key in _IVF_PINNED_HITS, f"no pinned entry for {sf} ({key} rows)"

    vec_id = np.asarray(t.column("vec_id").to_pylist())
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vec_id)
    vec_id, x = vec_id[order], x[order]

    cents = _lloyd_centroids(x)

    # corpus cell assignment (keep=1) and query probes (keep=4)
    corpus_cos = _cosine_matrix(x, cents)
    corpus_cell = np.argmax(corpus_cos, axis=1)
    q_mask = vec_id < 8
    q_ids, q_vecs = vec_id[q_mask], x[q_mask]
    q_cos = _cosine_matrix(q_vecs, cents)

    got = []
    for qi, qid in enumerate(q_ids):
        probe_order = np.lexsort(
            (np.arange(cents.shape[0]), -q_cos[qi])
        )[:N_PROBE]
        cand_mask = np.isin(corpus_cell, probe_order) & (vec_id != qid)
        cand_ids = vec_id[cand_mask]
        cand_cos = _cosine_matrix(
            q_vecs[qi : qi + 1], x[cand_mask]
        ).ravel()
        approx = set(_topk_ids(cand_cos, cand_ids, K))

        all_mask = vec_id != qid
        all_cos = _cosine_matrix(
            q_vecs[qi : qi + 1], x[all_mask]
        ).ravel()
        exact = set(_topk_ids(all_cos, vec_id[all_mask], K))
        got.append((int(qid), len(approx & exact)))

    assert got == _IVF_PINNED_HITS[key], (
        f"{sf}: numpy rederivation {got} != pinned {_IVF_PINNED_HITS[key]}"
    )
