import numpy as np

from roargraph_tpu.config import Metric
from roargraph_tpu import eval as reval


def test_recall_exact():
    res = np.array([[1, 2, 3], [4, 5, 6]])
    gt = np.array([[3, 2, 9], [7, 8, 9]])
    assert reval.recall_at_k(res, gt, 3) == (2 + 0) / 6


def test_rderr_ip_sign_correction():
    # engine reports negated dots; gt stores raw dots
    res = np.array([[-2.0, -1.0]])
    gt = np.array([[2.0, 1.0]])
    assert reval.rderr(res, gt, 2, Metric.IP) == 0.0
    res_off = np.array([[-2.2, -1.0]])
    assert abs(reval.rderr(res_off, gt, 2, Metric.IP) - 0.05) < 1e-9


def test_rderr_cosine_mapping():
    # cosine: gt files store 2*(1-ip); engine reports -ip
    ip = np.array([[0.5, 0.25]])
    res = -ip
    gt = 2.0 * (1.0 - ip)
    assert reval.rderr(res, gt, 2, Metric.COSINE) < 1e-12


def test_sweep_and_qps_at_recall(tmp_path):
    gt = np.tile(np.arange(10), (20, 1))
    perfect = np.tile(np.arange(10), (20, 1))

    def fake_search(cfg):
        ids = perfect if cfg.L_pq >= 20 else perfect[:, ::-1] * 0
        return ids, np.zeros((20, 10), np.float32), \
            np.full(20, cfg.L_pq), np.full(20, 3)

    csv_path = str(tmp_path / "eval.csv")
    rows = reval.sweep(fake_search, [10, 20, 40], gt, k=10, metric=Metric.IP,
                       n_queries=20, csv_path=csv_path, verbose=False)
    assert [r["recall"] for r in rows] == [0.1, 1.0, 1.0]
    assert reval.qps_at_recall(rows, 0.95) == max(r["qps"] for r in rows[1:])
    assert reval.qps_at_recall(rows, 2.0) is None
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith("10,")


def test_sweep_raw_values_below_k():
    # raw mode: the knob goes to search_fn verbatim (tile engine's T may be
    # < k, which SearchConfig would reject as an L_pq)
    gt = np.tile(np.arange(10), (20, 1))
    perfect = np.tile(np.arange(10), (20, 1))
    seen = []

    def fake_search(T):
        seen.append(T)
        return perfect, np.zeros((20, 10), np.float32), \
            np.full(20, T), np.full(20, 3)

    rows = reval.sweep(fake_search, [4, 8, 16], gt, k=10, metric=Metric.IP,
                       n_queries=20, verbose=False, raw=True)
    assert seen[::2] == [4, 8, 16]  # warmup + timed call per point
    assert [r["L_pq"] for r in rows] == [4, 8, 16]
    assert all(r["recall"] == 1.0 for r in rows)


def test_flat_sweep_batch_schedule():
    """Program-wall-bounding batch schedule (DESIGN.md round-4: the tunnel
    worker dies on ~60-75 s device programs; batch shrinks with L*N*D)."""
    from roargraph_tpu.eval import flat_sweep_batch as f

    assert f(100_000, 200, 1100) == 8192   # round-2 rule preserved
    assert f(100_000, 200, 1200) == 4096
    assert f(1_000_000, 200, 200) == 8192
    assert f(1_000_000, 200, 500) == 4096  # the observed 1M medoid fault
    assert f(1_000_000, 200, 1000) == 1024
    assert f(1_000_000, 200, 2000) == 512
    assert f(2_500_000, 512, 400) == 1024  # 512-d shifts tiers down
    assert f(1_000_000, 200, 10, cap=2048) == 2048  # cap respected
    assert all(f(n, d, l) >= 1 for n in (1, 10**6) for d in (8, 512)
               for l in (1, 10_000))
