"""Batched runner tests: output parity with the sequential runner, fallback
paths, journal integration, and upload semantics."""

import numpy as np
import pytest

from optflow_tpu.core.imgio import read_float_tiff
from optflow_tpu.engine.batch_runner import run_job_batched
from optflow_tpu.engine.runner import run_job
from optflow_tpu.sinks.store import JsonlMatchSink
from tests.conftest import make_fibsem_like

FAST_TV = {"nscales": 2, "warps": 2, "iterations": 25}


def _write_pairs(tmp_path, rng, n_pairs=5, h=32, w=48):
    import scipy.ndimage as ndi
    from PIL import Image

    paths = []
    for i in range(n_pairs + 1):
        im = make_fibsem_like(rng, h, w)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(im.astype(np.uint8)).save(str(p))
        paths.append(str(p))
    return paths


def _job(tmp_path, paths, outdir, **kw):
    job = {
        "style": 1,
        "scale": 1.0,
        "output_type": "flow",
        "output_dir": str(outdir),
        "rois": {"top": 16},
        "images": [
            {"p": paths[i], "q": paths[i + 1], "pId": f"t{i}",
             "qId": f"t{i+1}", "pGroupId": f"{i}.0",
             "qGroupId": f"{i+1}.0", "output_name": f"n{i}"}
            for i in range(len(paths) - 1)
        ],
        **FAST_TV,
    }
    job.update(kw)
    return job


def test_batched_matches_sequential_tiffs(tmp_path, rng):
    paths = _write_pairs(tmp_path, rng)
    d_seq = tmp_path / "seq"
    d_bat = tmp_path / "bat"
    d_seq.mkdir()
    d_bat.mkdir()
    s1 = run_job(_job(tmp_path, paths, d_seq))
    s2 = run_job_batched(_job(tmp_path, paths, d_bat), pair_batch=3)
    assert s1["pairs"] == s2["pairs"] == 5
    assert s2["batched"] == 5 and s2["sequential"] == 0
    for i in range(5):
        a = read_float_tiff(str(d_seq / f"n{i}_1.00_top_x.tiff"))
        b = read_float_tiff(str(d_bat / f"n{i}_1.00_top_x.tiff"))
        assert np.allclose(a, b, atol=1e-4), f"pair {i} diverged"


def test_batched_random_points_sink(tmp_path, rng):
    paths = _write_pairs(tmp_path, rng, n_pairs=4)
    out = tmp_path / "m.jsonl"
    job = _job(
        tmp_path, paths, tmp_path,
        output_type="random_points", npoints=6,
        match_sink="jsonl", match_output=str(out), debug=True,
    )
    stats = run_job_batched(job, pair_batch=2)
    assert stats["pairs"] == 4
    recs = JsonlMatchSink(str(out)).read_all()
    assert len(recs) == 4
    ids = {r["pId"] for r in recs}
    assert ids == {"t0", "t1", "t2", "t3"}
    for r in recs:
        assert len(r["matches"]["w"]) == 6


def test_batched_features_pairs_batch(tmp_path, rng):
    """Features-enabled pairs run through the batched path (device
    pre-alignment), matching the sequential path with the default aligner.
    Production job generation enables features near column boundaries
    (ref: gen_cross_file_list.py:33-41), so this is the production-relevant
    batch shape."""
    from optflow_tpu.engine.features_glue import default_aligner

    paths = _write_pairs(tmp_path, rng, n_pairs=2)
    d_bat = tmp_path / "bat"
    d_seq = tmp_path / "seq"
    d_bat.mkdir()
    d_seq.mkdir()
    job_b = _job(tmp_path, paths, d_bat, features=2)
    stats = run_job_batched(job_b, pair_batch=4)
    assert stats["batched"] == 2 and stats["sequential"] == 0

    from optflow_tpu.engine.runner import run_job

    job_s = _job(tmp_path, paths, d_seq, features=2)
    run_job(job_s, aligner=default_aligner)
    for i in range(2):
        a = read_float_tiff(str(d_bat / f"n{i}_1.00_top_x.tiff"))
        b = read_float_tiff(str(d_seq / f"n{i}_1.00_top_x.tiff"))
        assert np.allclose(a, b, atol=1e-3), f"features pair {i} diverged"


def test_batched_custom_aligner_forces_sequential(tmp_path, rng):
    """A caller-supplied host aligner can't run inside the batch; features
    pairs fall back to the sequential path where it is honored."""
    calls = []

    def my_aligner(f1, f0, im_args, args):
        calls.append(1)
        return np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)

    paths = _write_pairs(tmp_path, rng, n_pairs=2)
    job = _job(tmp_path, paths, tmp_path, features=2)
    stats = run_job_batched(job, pair_batch=4, aligner=my_aligner)
    assert stats["sequential"] == 2 and stats["batched"] == 0
    assert len(calls) == 2


def test_batched_mixed_params_group_separately(tmp_path, rng):
    paths = _write_pairs(tmp_path, rng, n_pairs=4)
    job = _job(tmp_path, paths, tmp_path)
    job["images"][0]["iterations"] = 10  # different params -> own group
    stats = run_job_batched(job, pair_batch=10)
    assert stats["pairs"] == 4
    assert stats["batched"] == 4


def test_batched_journal_resume(tmp_path, rng):
    paths = _write_pairs(tmp_path, rng, n_pairs=3)
    job = _job(tmp_path, paths, tmp_path,
               journal=str(tmp_path / "j.jsonl"))
    s1 = run_job_batched(dict(job), pair_batch=2)
    assert s1["pairs"] == 3
    s2 = run_job_batched(dict(job), pair_batch=2)
    assert s2["resumed"] == 3 and s2["pairs"] == 0


def test_batched_skips_bad_images(tmp_path, rng):
    paths = _write_pairs(tmp_path, rng, n_pairs=2)
    job = _job(tmp_path, paths, tmp_path)
    job["images"][0]["p"] = str(tmp_path / "missing.png")
    stats = run_job_batched(job, pair_batch=2)
    assert stats["skipped"] == 1 and stats["pairs"] == 1
