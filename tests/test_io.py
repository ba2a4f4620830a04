import numpy as np
import pytest

from roargraph_tpu import io as rio
from roargraph_tpu.graph import PaddedGraph


def test_fbin_roundtrip(tmp_path, rng):
    data = rng.standard_normal((17, 5)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    rio.save_fbin(p, data)
    assert rio.load_meta(p) == (17, 5)
    out = rio.load_fbin(p)
    np.testing.assert_array_equal(out, data)
    out_mm = rio.load_fbin(p, mmap=True)
    np.testing.assert_array_equal(np.asarray(out_mm), data)


def test_fbin_size_validation(tmp_path, rng):
    data = rng.standard_normal((4, 3)).astype(np.float32)
    p = str(tmp_path / "bad.fbin")
    rio.save_fbin(p, data)
    with open(p, "ab") as f:
        np.zeros(3, np.float32).tofile(f)  # extra row not in header
    with pytest.raises(ValueError, match="size wrong"):
        rio.load_meta(p)


def test_gt_roundtrip(tmp_path, rng):
    ids = rng.integers(0, 100, (7, 10)).astype(np.uint32)
    dists = rng.standard_normal((7, 10)).astype(np.float32)
    p = str(tmp_path / "gt.bin")
    rio.save_gt(p, ids, dists)
    # header validation path expects ids+dists payload (util.h:98)
    assert rio.load_meta(p, np.uint32, expect_gt=True) == (7, 10)
    ids2, dists2 = rio.load_gt(p)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(dists, dists2)


def test_patch_npts(tmp_path, rng):
    data = rng.standard_normal((10, 4)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    rio.save_fbin(p, data)
    rio.patch_npts(p, 3)
    npts, dim = rio._read_header(p)
    assert (npts, dim) == (3, 4)


def test_projection_index_roundtrip(tmp_path):
    lists = [np.array([1, 2, 3]), np.array([], dtype=np.uint32),
             np.array([0]), np.array([2, 0])]
    p = str(tmp_path / "g.index")
    rio.save_projection_index(p, 2, lists)
    ep, out = rio.load_projection_index(p)
    assert ep == 2
    assert len(out) == 4
    for a, b in zip(lists, out):
        np.testing.assert_array_equal(np.asarray(a, np.uint32), b)


def test_bipartite_index_roundtrip(tmp_path):
    lists = [np.array([1]), np.array([0, 2]), np.array([], np.uint32)]
    p = str(tmp_path / "b.index")
    rio.save_bipartite_index(p, lists)
    out = rio.load_bipartite_index(p)
    for a, b in zip(lists, out):
        np.testing.assert_array_equal(np.asarray(a, np.uint32), b)


def test_padded_graph_roundtrip(tmp_path):
    lists = [np.array([1, 2]), np.array([2]), np.array([0, 1, 2, 1])]
    g = PaddedGraph.from_lists(lists, ep=1)
    assert g.max_degree == 4  # sized from the raw (pre-dedup) row lengths
    # row 2 has ids [0,1,2,1] -> dedup to [0,1,2] + pad
    np.testing.assert_array_equal(g.ids[2], [0, 1, 2, -1])
    assert g.degrees().tolist() == [2, 1, 3]

    p1 = str(tmp_path / "g.npz")
    g.save_npz(p1)
    g1 = PaddedGraph.load_npz(p1)
    np.testing.assert_array_equal(g.ids, g1.ids)
    assert g1.ep == 1

    p2 = str(tmp_path / "g.index")
    g.save_reference(p2)
    g2 = PaddedGraph.load_reference(p2)
    # reference format is ragged: reload may shrink max_degree, but the
    # logical adjacency must be identical
    assert g2.max_degree == 3
    for a, b in zip(g.to_lists(), g2.to_lists()):
        np.testing.assert_array_equal(a, b)
    assert g2.ep == 1


def test_nsg_index_loader(tmp_path):
    import numpy as np
    from roargraph_tpu import io as rio
    # NSG layout: width, ep, then per-node [deg, ids]
    chunks = [np.array([64, 2], dtype="<u4")]
    lists = [np.array([1, 2], dtype="<u4"), np.array([0], dtype="<u4"),
             np.array([], dtype="<u4")]
    for l in lists:
        chunks.append(np.array([l.size], dtype="<u4"))
        chunks.append(l)
    p = str(tmp_path / "g.nsg")
    np.concatenate(chunks).tofile(p)
    ep, out = rio.load_nsg_index(p, npts=3)
    assert ep == 2
    assert [o.tolist() for o in out] == [[1, 2], [0], []]


def test_reachability_and_repair(rng):
    import numpy as np
    from roargraph_tpu.graph import PaddedGraph, reachable_from, \
        repair_connectivity
    base = rng.standard_normal((10, 4)).astype(np.float32)
    # two components: {0,1,2} reachable from ep=0; {3..9} a separate chain
    lists = [[1], [2], [0], [4], [5], [6], [7], [8], [9], [3]]
    g = PaddedGraph.from_lists([np.array(l) for l in lists], ep=0)
    seen = reachable_from(g)
    assert seen[:3].all() and not seen[3:].any()
    added = repair_connectivity(g, base, "l2")
    assert added >= 1
    assert reachable_from(g).all()


def test_check_min_results_raises(rng):
    import numpy as np
    import roargraph_tpu as rt
    from roargraph_tpu.graph import PaddedGraph
    from roargraph_tpu import search as rsearch
    base = rng.standard_normal((6, 4)).astype(np.float32)
    # isolated entry point: only 1 result ever reachable
    g = PaddedGraph.from_lists([np.array([], np.int32)] * 6, ep=0)
    q = rng.standard_normal((2, 4)).astype(np.float32)
    cfg = rt.SearchConfig(k=3, L_pq=4, metric="l2", batch_size=2,
                          check_min_results=True)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="not enough results"):
        rsearch.search(g, base, q, cfg)


def test_projection_index_golden_bytes(tmp_path):
    """Pin the exact reference byte layout: [u32 ep][u32 nd] then per node
    [u32 deg][deg * u32 ids], little-endian (src/index_bipartite.cpp:2606)."""
    import numpy as np
    from roargraph_tpu import io as rio
    p = str(tmp_path / "g.index")
    rio.save_projection_index(p, ep=7, neighbors=[[3, 1], [], [2]])
    raw = open(p, "rb").read()
    expect = (b"\x07\x00\x00\x00"          # ep
              b"\x03\x00\x00\x00"          # nd
              b"\x02\x00\x00\x00\x03\x00\x00\x00\x01\x00\x00\x00"  # node 0
              b"\x00\x00\x00\x00"          # node 1 (deg 0)
              b"\x01\x00\x00\x00\x02\x00\x00\x00")                 # node 2
    assert raw == expect


def test_gt_golden_bytes(tmp_path):
    import numpy as np
    from roargraph_tpu import io as rio
    p = str(tmp_path / "g.bin")
    rio.save_gt(p, np.array([[1, 2]], np.uint32),
                np.array([[0.5, 1.0]], np.float32))
    raw = open(p, "rb").read()
    expect = (b"\x01\x00\x00\x00" b"\x02\x00\x00\x00"   # npts, K
              b"\x01\x00\x00\x00" b"\x02\x00\x00\x00"   # ids
              b"\x00\x00\x00\x3f" b"\x00\x00\x80\x3f")  # 0.5f, 1.0f
    assert raw == expect
