import numpy as np
import pytest

import roargraph_tpu as rt
from roargraph_tpu.ops.topk import knn
from roargraph_tpu import eval as reval
from roargraph_tpu import native
from tests.conftest import make_crossmodal


def test_facade_build_search_save_load(tmp_path, rng):
    base, train_q = make_crossmodal(rng, n_base=500, n_query=400, dim=12)
    eval_q = make_crossmodal(rng, n_base=1, n_query=80, dim=12)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)
    idx = rt.RoarGraphIndex.build(base, train_q, config=cfg, with_seeds=True)
    assert idx.seeds is not None
    gt, _ = knn(eval_q, base, k=5, metric="ip")
    ids, d, cmps, hops = idx.search(eval_q, k=5, L_pq=40)
    rec = reval.recall_at_k(ids, gt, 5)
    assert rec > 0.85, rec

    p = str(tmp_path / "idx")
    idx.save(p)
    idx2 = rt.RoarGraphIndex.load(p)
    ids2, _, _, _ = idx2.search(eval_q, k=5, L_pq=40)
    np.testing.assert_array_equal(ids, ids2)

    if native.available():
        nids, _, _, _ = idx2.search_cpu(eval_q, k=5, L_pq=40)
        rec_cpu = reval.recall_at_k(nids, gt, 5)
        assert rec_cpu > 0.85


def test_facade_cosine_normalizes(rng):
    base, train_q = make_crossmodal(rng, n_base=300, n_query=250, dim=10)
    cfg = rt.BuildConfig(metric="cosine", M_sq=15, M_pjbp=5, L_pjpq=20,
                         prune_batch=128, search_batch=64)
    idx = rt.RoarGraphIndex.build(base, train_q, config=cfg)
    norms = np.linalg.norm(idx.base, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    q = make_crossmodal(rng, n_base=1, n_query=20, dim=10)[1]
    ids, d, _, _ = idx.search(q, k=3, L_pq=10)
    assert (d >= -1.001).all()
