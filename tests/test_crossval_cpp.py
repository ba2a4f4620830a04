"""Cross-validation against the ACTUAL reference C++ implementation.

Compiles the reference sources (``/root/reference/src``) out-of-tree via
``scripts/crossval_cpp/build.sh`` (shimming only the absent third-party
headers) and closes the byte-format-compatibility claim with external
evidence in both directions:

  C++ -> us: an index built and written by the reference's
             ``BuildRoarGraph``/``SaveProjectionGraph`` loads through
             ``PaddedGraph.load_reference`` and serves good results in our
             engine.
  us -> C++: an index our build wrote via ``save_reference`` loads through
             the reference's ``LoadProjectionGraph`` and serves good results
             in the reference's ``SearchRoarGraph``.

Skipped when the reference tree or toolchain is unavailable.
"""
import os
import subprocess

import numpy as np
import pytest

import roargraph_tpu as rt
from roargraph_tpu import io as rio
from roargraph_tpu.build import build_roargraph
from roargraph_tpu.graph import PaddedGraph
from roargraph_tpu.ops.topk import knn
from roargraph_tpu.search import search
from roargraph_tpu import eval as reval
from tests.conftest import make_crossmodal

REF = "/root/reference"
BUILD_SH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "crossval_cpp", "build.sh")


@pytest.fixture(scope="module")
def crossval_bin():
    if not os.path.isdir(os.path.join(REF, "src")):
        pytest.skip("reference tree unavailable")
    try:
        out = subprocess.run(["sh", BUILD_SH], capture_output=True,
                             text=True, timeout=900)
    except (OSError, subprocess.TimeoutExpired) as e:
        pytest.skip(f"compiler unavailable: {e}")
    if out.returncode != 0:
        pytest.skip(f"reference does not compile here: {out.stderr[-500:]}")
    return out.stdout.strip().splitlines()[-1]


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("crossval")
    rng = np.random.default_rng(7)
    base, train_q = make_crossmodal(rng, n_base=1500, n_query=900, dim=24)
    eval_q = make_crossmodal(rng, n_base=1, n_query=128, dim=24)[1]
    gt_ids, gt_d = knn(train_q, base, k=32, metric="ip")
    paths = {k: str(tmp / f"{k}.bin") for k in
             ("base", "train_q", "eval_q", "gt", "cpp_idx", "our_idx",
              "cpp_res")}
    rio.save_fbin(paths["base"], base)
    rio.save_fbin(paths["train_q"], train_q)
    rio.save_fbin(paths["eval_q"], eval_q)
    rio.save_gt(paths["gt"], gt_ids, gt_d)
    eval_gt, _ = knn(eval_q, base, k=10, metric="ip")
    return dict(paths=paths, base=base, train_q=train_q, eval_q=eval_q,
                gt_ids=gt_ids, eval_gt=eval_gt)


M_SQ, M_PJBP, L_PJPQ = 24, 8, 40


def test_cpp_built_index_serves_in_our_engine(crossval_bin, data):
    p = data["paths"]
    out = subprocess.run(
        [crossval_bin, "build", p["base"], p["train_q"], p["gt"],
         p["cpp_idx"], "ip", str(M_SQ), str(M_PJBP), str(L_PJPQ)],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-800:]

    g = PaddedGraph.load_reference(p["cpp_idx"])
    assert g.ids.shape[0] == data["base"].shape[0]
    ids, d, cmps, hops = search(
        g, data["base"], data["eval_q"],
        rt.SearchConfig(k=10, L_pq=60, metric="ip", batch_size=128))
    rec = reval.recall_at_k(ids, data["eval_gt"], 10)
    # the C++-written graph must navigate well in our engine
    assert rec > 0.85, rec


def test_our_index_serves_in_cpp_engine(crossval_bin, data):
    p = data["paths"]
    g, _ = build_roargraph(
        data["base"], data["gt_ids"],
        rt.BuildConfig(metric="ip", M_sq=M_SQ, M_pjbp=M_PJBP,
                       L_pjpq=L_PJPQ))
    g.save_reference(p["our_idx"])
    out = subprocess.run(
        [crossval_bin, "search", p["base"], p["train_q"], p["our_idx"],
         p["eval_q"], "ip", "10", "60", p["cpp_res"]],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-800:]

    raw = np.fromfile(p["cpp_res"], dtype=np.uint32)
    qn, k = int(raw[0]), int(raw[1])
    assert (qn, k) == (data["eval_q"].shape[0], 10)
    cpp_ids = raw[2:].reshape(qn, k).astype(np.int64)
    rec = reval.recall_at_k(cpp_ids, data["eval_gt"], 10)
    # our on-disk index must navigate well in the reference's own engine
    assert rec > 0.85, rec
