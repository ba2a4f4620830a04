import numpy as np
import pytest

from roargraph_tpu import io as rio
from roargraph_tpu.data import prep
from roargraph_tpu.utils import Timer, TimerRegistry


def test_export_fbin_from_npy(tmp_path, rng):
    shards = []
    rows = []
    for i in range(3):
        a = rng.standard_normal((4 + i, 6)).astype(np.float32)
        p = str(tmp_path / f"s{i}.npy")
        np.save(p, a)
        shards.append(p)
        rows.append(a)
    out = str(tmp_path / "base.fbin")
    n = prep.export_fbin_from_npy(shards, out)
    assert n == 4 + 5 + 6
    data = rio.load_fbin(out)
    np.testing.assert_allclose(data, np.concatenate(rows))


def test_export_rejects_dim_mismatch(tmp_path, rng):
    p1 = str(tmp_path / "a.npy"); np.save(p1, np.zeros((2, 4), np.float32))
    p2 = str(tmp_path / "b.npy"); np.save(p2, np.zeros((2, 5), np.float32))
    with pytest.raises(ValueError, match="dim"):
        prep.export_fbin_from_npy([p1, p2], str(tmp_path / "o.fbin"))


def test_webvid_mean_pool(rng):
    frames = rng.standard_normal((7, 512)).astype(np.float32)
    v = prep.webvid_mean_pool(frames)
    assert v.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)
    # invariant under per-frame scaling (frames are normalized first)
    v2 = prep.webvid_mean_pool(frames * 7.5)
    np.testing.assert_allclose(v, v2, atol=1e-5)


def test_webvid_build_fbin(tmp_path, rng):
    vids = [rng.standard_normal((3, 8)).astype(np.float32) for _ in range(5)]
    out = str(tmp_path / "webvid.fbin")
    n = prep.webvid_build_fbin(vids, out, dim=8)
    assert n == 5
    data = rio.load_fbin(out)
    assert data.shape == (5, 8)
    np.testing.assert_allclose(np.linalg.norm(data, axis=1), 1.0, rtol=1e-5)


def test_truncate_fbin(tmp_path, rng):
    data = rng.standard_normal((10, 4)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    rio.save_fbin(p, data)
    prep.truncate_fbin(p, 6)
    out = rio.load_fbin(p)
    np.testing.assert_array_equal(out, data[:6])
    with pytest.raises(ValueError):
        prep.truncate_fbin(p, 100)


def test_registry_dataset_specs():
    assert prep.REGISTRY["t2i-10M"].dim == 200
    assert prep.REGISTRY["laion-10M"].metric == "ip"
    assert prep.REGISTRY["webvid-2.5M"].n_base == 2_500_000


def test_timer_registry():
    reg = TimerRegistry()
    with reg.time("phase_a"):
        pass
    with reg.time("phase_a"):
        pass
    with reg.time("phase_b"):
        pass
    assert reg["phase_a"].count == 2
    rep = reg.report()
    assert "phase_a" in rep and "phase_b" in rep
    assert set(reg.as_dict()) == {"phase_a", "phase_b"}


def test_prep_cli_roundtrip(tmp_path, rng, capsys):
    """The prep CLI (SURVEY §2.4 tooling surface): export-npy -> truncate ->
    patch-npts -> info, plus webvid-pool over an .npz of videos."""
    from roargraph_tpu.cli.prep import main as prep_main

    a = rng.standard_normal((6, 8)).astype(np.float32)
    b = rng.standard_normal((4, 8)).astype(np.float32)
    np.save(tmp_path / "s0.npy", a)
    np.save(tmp_path / "s1.npy", b)
    out = str(tmp_path / "base.fbin")
    assert prep_main(["export-npy", str(tmp_path / "s0.npy"),
                      str(tmp_path / "s1.npy"), "--out", out]) == 0
    assert rio.load_meta(out) == (10, 8)
    assert prep_main(["truncate", out, "--rows", "7"]) == 0
    got = rio.load_fbin(out)
    np.testing.assert_allclose(got, np.concatenate([a, b])[:7])
    # patch-npts rewrites only the header (used after a raw dd-truncation);
    # info reads the raw header, while load_meta validates against the size
    assert prep_main(["patch-npts", out, "--npts", "5"]) == 0
    assert prep_main(["info", out]) == 0
    assert "npts=5" in capsys.readouterr().out
    with pytest.raises(ValueError, match="size wrong"):
        rio.load_meta(out)
    assert prep_main(["patch-npts", out, "--npts", "7"]) == 0
    assert rio.load_meta(out) == (7, 8)

    vids = {f"v{i}": rng.standard_normal((3 + i, 8)).astype(np.float32)
            for i in range(4)}
    np.savez(tmp_path / "vids.npz", **vids)
    pooled = str(tmp_path / "pooled.fbin")
    assert prep_main(["webvid-pool", str(tmp_path / "vids.npz"),
                      "--out", pooled, "--dim", "8"]) == 0
    got = rio.load_fbin(pooled)
    assert got.shape == (4, 8)
    np.testing.assert_allclose(
        got[0], prep.webvid_mean_pool(vids["v0"]), rtol=1e-6)
