"""End-to-end CLI pipeline smoke test: gt -> build -> search (all three
engines' drivers invoked in-process via main(argv), the same surface as the
reference's four binaries)."""
import csv
import os

import numpy as np
import pytest

from roargraph_tpu import io as rio
from roargraph_tpu import native
from tests.conftest import make_crossmodal


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory, rng_module=None):
    rng = np.random.default_rng(7)
    tmp = tmp_path_factory.mktemp("cli")
    base, train_q = make_crossmodal(rng, n_base=400, n_query=300, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=32, dim=16)[1]
    paths = {
        "base": str(tmp / "base.fbin"),
        "train": str(tmp / "query.train.fbin"),
        "eval": str(tmp / "query.eval.fbin"),
        "train_gt": str(tmp / "train.gt.bin"),
        "eval_gt": str(tmp / "eval.gt.bin"),
        "index": str(tmp / "roar.index"),
        "csv": str(tmp / "eval.csv"),
    }
    rio.save_fbin(paths["base"], base)
    rio.save_fbin(paths["train"], train_q)
    rio.save_fbin(paths["eval"], eval_q)
    return paths


def test_cli_gt(pipeline):
    from roargraph_tpu.cli import gt as cli_gt
    cli_gt.main(["--dist", "ip", "--base_file", pipeline["base"],
                 "--query_file", pipeline["train"],
                 "--gt_file", pipeline["train_gt"], "--K", "16",
                 "--tile", "256", "--query_batch", "128"])
    cli_gt.main(["--dist", "ip", "--base_file", pipeline["base"],
                 "--query_file", pipeline["eval"],
                 "--gt_file", pipeline["eval_gt"], "--K", "10",
                 "--tile", "256", "--query_batch", "128"])
    ids, dists = rio.load_gt(pipeline["train_gt"])
    assert ids.shape == (300, 16)
    # gt files store raw (positive) dot products, descending
    assert (np.diff(dists, axis=1) <= 1e-5).all()


def test_cli_build(pipeline):
    from roargraph_tpu.cli import build as cli_build
    cli_build.main(["--dist", "ip",
                    "--base_data_path", pipeline["base"],
                    "--sampled_query_data_path", pipeline["train"],
                    "--projection_index_save_path", pipeline["index"],
                    "--learn_base_nn_path", pipeline["train_gt"],
                    "--M_sq", "16", "--M_pjbp", "5", "--L_pjpq", "24"])
    ep, lists = rio.load_projection_index(pipeline["index"])
    assert len(lists) == 400 and 0 <= ep < 400


@pytest.mark.parametrize("engine", ["tpu", "tile", "cpu"])
def test_cli_search_engines(pipeline, engine):
    if engine == "cpu" and not native.available():
        pytest.skip("native engine unavailable")
    from roargraph_tpu.cli import search as cli_search
    csv_path = pipeline["csv"] + "." + engine
    argv = ["--dist", "ip",
            "--base_data_path", pipeline["base"],
            "--query_path", pipeline["eval"],
            "--gt_path", pipeline["eval_gt"],
            "--projection_index_save_path", pipeline["index"],
            "--L_pq", "10", "24", "--k", "10",
            "--batch_size", "32",
            "--engine", engine,
            "--evaluation_save_path", csv_path]
    if engine == "tile":
        argv += ["--tile_C", "64", "--tile_T", "4", "12",
                 "--tile_dtype", "float32"]
    cli_search.main(argv)
    rows = list(csv.reader(open(csv_path)))
    if engine == "tile":
        # non-L_pq sweeps carry a disambiguating comment tag row
        assert rows[0][0].startswith("# knob=T")
        rows = rows[1:]
    assert len(rows) == 2
    # columns: L, qps, cmps, latency, recall, rderr, hops
    assert len(rows[0]) == 7
    recalls = [float(r[4]) for r in rows]
    assert recalls[1] >= recalls[0]
    assert recalls[1] > 0.5
