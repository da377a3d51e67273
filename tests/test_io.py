"""IO: format readers/writers, dataset registry, checkpointing, converter.

Golden values come from the reference's own data files when mounted
(SURVEY.md §4: galaxy_20K.bin header == (0.0, 20000, 3, 0, 2500, 17500)).
"""

import json
import os

import numpy as np
import pytest

from n_body_problem_tpu import SimConfig, models
from n_body_problem_tpu.io import (
    DATASETS,
    load_checkpoint,
    load_dataset,
    read_dat,
    read_snap,
    read_tab,
    read_tipsy,
    save_checkpoint,
    tipsy_to_csv,
    write_snap,
    write_tab,
    write_tipsy,
)
from n_body_problem_tpu.io.checkpoint import export_snap
from n_body_problem_tpu.io.text import BodyData


# ------------------------------------------------------------ round-trips
def test_tipsy_roundtrip(tmp_path):
    state = models.plummer(100, seed=0)
    p = tmp_path / "t.bin"
    pos, vel, mass = (np.asarray(x) for x in (state.pos, state.vel, state.mass))
    eps = np.full(100, 0.01, np.float32)
    write_tipsy(p, pos, vel, mass, eps, time=2.5, n_dark=30)
    d = read_tipsy(p)
    assert d.time == 2.5 and d.n_dark == 30 and d.n_star == 70
    np.testing.assert_allclose(d.pos, pos, rtol=1e-6)
    np.testing.assert_allclose(d.vel, vel, rtol=1e-6)
    np.testing.assert_allclose(d.mass, mass, rtol=1e-6)
    np.testing.assert_allclose(d.eps, eps, rtol=1e-6)


def test_tab_roundtrip(tmp_path):
    state = models.plummer(64, seed=1)
    data = BodyData(
        pos=np.asarray(state.pos), vel=np.asarray(state.vel),
        mass=np.asarray(state.mass), eps=np.zeros(64, np.float32),
    )
    p = tmp_path / "t.tab"
    write_tab(p, data)
    d = read_tab(p)
    np.testing.assert_allclose(d.pos, data.pos, rtol=1e-5)
    np.testing.assert_allclose(d.mass, data.mass, rtol=1e-5)


def test_tab_trailing_body_quirk(tmp_path):
    p = tmp_path / "t.tab"
    p.write_text("1.0 1 2 3 4 5 6\n2.0 7 8 9 10 11 12\n")
    clean = read_tab(p)
    quirky = read_tab(p, quirk_trailing_body=True)
    assert clean.n == 2
    assert quirky.n == 3  # Q3: the eof re-parse duplicates the last body
    np.testing.assert_array_equal(quirky.pos[2], quirky.pos[1])


def test_dat_axis_order(tmp_path):
    p = tmp_path / "t.dat"
    # z y x vz vy vx (kernel.cu:387): body at x=3, y=2, z=1; v=(6,5,4)
    p.write_text("1 2 3 4 5 6\n\n")  # plus a blank line to skip
    d = read_dat(p)
    assert d.n == 1
    np.testing.assert_array_equal(d.pos[0], [3.0, 2.0, 1.0])
    np.testing.assert_array_equal(d.vel[0], [6.0, 5.0, 4.0])
    assert d.mass[0] == 1.0


def test_snap_roundtrip(tmp_path):
    state = models.plummer(32, seed=2)
    data = BodyData(
        pos=np.asarray(state.pos), vel=np.asarray(state.vel),
        mass=np.asarray(state.mass), eps=np.full(32, 0.05, np.float32),
        time=9.5,
    )
    p = tmp_path / "t.snap"
    write_snap(p, data)
    d = read_snap(p)
    assert d.time == 9.5 and d.n == 32
    np.testing.assert_allclose(d.pos, data.pos, rtol=1e-5)
    np.testing.assert_allclose(d.eps, data.eps, rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    cfg = SimConfig(dt=0.004, integrator="leapfrog")
    state = models.plummer(50, seed=3)
    p = tmp_path / "ck.npz"
    save_checkpoint(p, state, cfg)
    state2, cfg2 = load_checkpoint(p)
    assert cfg2 == cfg
    assert state2.n_real == 50
    np.testing.assert_array_equal(np.asarray(state2.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(state2.acc), np.asarray(state.acc))


def test_export_snap_reimport(tmp_path):
    state = models.plummer(40, seed=4)
    p = tmp_path / "out.snap"
    export_snap(p, state)
    d = read_snap(p)
    assert d.n == 40
    np.testing.assert_allclose(d.pos, np.asarray(state.pos), rtol=1e-5)


# ------------------------------------------------------- native vs python
def test_native_parser_matches_python(tmp_path):
    from n_body_problem_tpu.io import native

    p = tmp_path / "t.tab"
    rows = ["1.5 1 2 3 -4e-2 5E+1 6", "  ", "2.5 -7 8.25 9 10 11 12"]
    p.write_text("\n".join(rows) + "\n")

    os.environ["NBODY_NO_NATIVE"] = "1"
    try:
        py = read_tab(p)
    finally:
        os.environ.pop("NBODY_NO_NATIVE")

    if not native.available():
        pytest.skip("native toolchain unavailable")
    nat = native.parse_table(p, 7, skip_blank=True)
    assert nat.shape == (2, 7)
    np.testing.assert_allclose(nat[:, 1:4], py.pos, rtol=1e-6)
    np.testing.assert_allclose(nat[:, 0], py.mass, rtol=1e-6)


# ------------------------------------------------------ reference golden
def test_reference_tipsy_header(reference_data_dir):
    d = read_tipsy(reference_data_dir / "galaxy_20K.bin")
    assert d.time == 0.0
    assert d.n_dark == 2500 and d.n_star == 17500
    assert len(d.mass) == 20000
    assert np.isfinite(d.pos).all() and np.isfinite(d.vel).all()


def test_reference_tipsy_matches_reference_csv(reference_data_dir):
    """The reference ships a CSV export of galaxy_20K.bin made by its own
    converter (tool.cpp) — byte-level ground truth for our binary reader."""
    d = read_tipsy(reference_data_dir / "galaxy_20K.bin")
    csv = np.genfromtxt(
        reference_data_dir / "galaxy_20k.csv", delimiter=",", skip_header=1,
        max_rows=500,
    )
    np.testing.assert_allclose(d.pos[:500], csv[:, 1:4], rtol=1e-4)
    np.testing.assert_allclose(d.mass[:500], csv[:, 4], rtol=1e-4)
    np.testing.assert_allclose(d.vel[:500], csv[:, 5:8], rtol=1e-4)
    np.testing.assert_allclose(d.eps[:500], csv[:, 8], rtol=1e-4)


def test_reference_snap_headers(reference_data_dir):
    d = read_snap(reference_data_dir / "k17c.snap")
    assert d.n == 32770 and d.time == pytest.approx(9.5)
    d2 = read_snap(reference_data_dir / "k17hp.snap")
    assert d2.n == 10002 and d2.time == pytest.approx(7.75)


def test_reference_stars_dat(reference_data_dir):
    d = read_dat(reference_data_dir / "stars.dat")
    assert d.n > 40000
    assert (d.mass == 1.0).all()


def test_dataset_registry(reference_data_dir):
    state, spec = load_dataset(0, directory=reference_data_dir)
    assert spec.scale_factors == (200, 120, 200)
    assert state.n_real == 20000
    state4, spec4 = load_dataset(4, directory=reference_data_dir)
    assert state4.n_real == 32770
    # Q1 quirk compat: snap through the dat reader — every non-blank line
    # becomes a unit-mass body (3 header lines + 8 value lines per body), so
    # "dataset 4" in the reference is really ~131k bodies, which is exactly
    # why it runs at "10 fps" (kernel.cu:1001).
    q, _ = load_dataset(4, directory=reference_data_dir, quirk_compat=True)
    assert q.n_real == 131083  # 3 + 4*32770 value lines (file lacks a final \n)
    assert float(np.asarray(q.mass).max()) == 1.0


def test_dataset_reference_padding(reference_data_dir):
    state, _ = load_dataset(0, directory=reference_data_dir, pad_reference_style=True)
    assert state.n == 20225  # ceil(20000/256)*256 + 1 (kernel.cu:260-278)
    assert state.n_real == 20000


def test_dataset_fallback_model(tmp_path):
    state, spec = load_dataset(2, directory=tmp_path, seed=1)  # tab65536 missing
    assert state.n_real == 65536  # 65535 disk stars + 1 bulge
    assert spec.reader == "tab"


def test_converter_matches_reference_csv(reference_data_dir, tmp_path):
    out = tmp_path / "out.csv"
    n = tipsy_to_csv(reference_data_dir / "galaxy_20K.bin", out)
    assert n == 20000
    ours = out.read_text().splitlines()
    theirs = (reference_data_dir / "galaxy_20k.csv").read_text().splitlines()
    assert ours[0] == theirs[0]
    # Values may differ in the last printed digit (%g); compare parsed.
    for i in (1, 2, 100, 20000):
        a = np.array(ours[i].split(","), dtype=np.float64)
        b = np.array(theirs[i].split(","), dtype=np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_csv_roundtrip_with_converter(reference_data_dir, tmp_path):
    from n_body_problem_tpu.io import read_csv

    out = tmp_path / "o.csv"
    tipsy_to_csv(reference_data_dir / "galaxy_20K.bin", out)
    d = read_csv(out)
    t = read_tipsy(reference_data_dir / "galaxy_20K.bin")
    assert d.n == 20000
    np.testing.assert_allclose(d.pos, t.pos, rtol=1e-4)
    np.testing.assert_allclose(d.mass, t.mass, rtol=1e-4)


def test_read_reference_shipped_csv(reference_data_dir):
    from n_body_problem_tpu.io import read_csv

    d = read_csv(reference_data_dir / "galaxy_20k.csv")
    assert d.n == 20000
    np.testing.assert_allclose(d.pos[0], [0.471854, 0.109532, 0.898546], rtol=1e-5)
