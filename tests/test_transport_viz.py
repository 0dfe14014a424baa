"""Scalar transport physics and the visualization pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import lid_cavity, transport
from cfdsim_tpu.io_ import SnapshotWriter, restore
from cfdsim_tpu.viz import make_video, plot_energy_history, render_frames_from_hdf5, thin_frames


def _run(case, n_steps, chunk=100):
    f = jax.jit(
        lambda s, c: jax.lax.scan(lambda st, _: case.step(st, c), s, None, length=chunk)
    )
    st = case.state
    m = None
    for _ in range(n_steps // chunk):
        st, m = f(st, jnp.float32(1.0))
    return st, m


def test_transport_maximum_principle_and_mixing():
    case = transport(n=48, Re=100.0, Pe=100.0)
    st, m = _run(case, 800, chunk=200)
    theta = np.asarray(st.theta)
    # upwind + diffusion is monotone: θ stays within the BC range [0, 1]
    assert theta.min() >= -1e-5
    assert theta.max() <= 1.0 + 1e-5
    # the lid stirs hot fluid into the cavity: interior mean grows
    assert float(np.asarray(m.theta_mean)[-1]) > 0.01
    assert bool(jnp.all(jnp.isfinite(st.theta)))


def test_transport_pure_diffusion_decay():
    # zero flow (no lid): a sine blob decays diffusively
    from cfdsim_tpu.models import transport as tr
    from cfdsim_tpu.grid import Grid

    g = Grid(nx=64, ny=64)
    cfg = tr.TransportConfig(grid=g, kappa=0.01, scheme="central")
    step = tr.make_transport_step(cfg, bc_fn=lambda th: th)  # frame untouched
    x = np.linspace(0, 1, 64)
    X, Y = np.meshgrid(x, x)
    theta = jnp.asarray(np.sin(np.pi * X) * np.sin(np.pi * Y), jnp.float32)
    u = jnp.zeros_like(theta)
    dt = 0.2 * g.dx**2 / cfg.kappa
    n = 50
    f = jax.jit(lambda th: jax.lax.scan(
        lambda t_, _: (step(t_, u, u, dt), None), th, None, length=n)[0])
    out = f(theta)
    # interior follows exp(-2 kappa pi^2 t); boundary frame was left fixed,
    # so compare mid-domain
    expected = np.exp(-2.0 * cfg.kappa * np.pi**2 * n * dt)
    mid = float(out[32, 32]) / float(theta[32, 32])
    assert mid == pytest.approx(expected, rel=0.05)


@pytest.fixture(scope="module")
def snapshot_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viz")
    case = lid_cavity(n=32, Re=100.0)
    writer = SnapshotWriter(tmp / "cavity.h5")
    f = jax.jit(lambda s, c: jax.lax.scan(
        lambda st, _: case.step(st, c), s, None, length=50)[0])
    st = case.state
    for i in range(3):
        writer.save(int(st.step), float(st.t), u=st.u, v=st.v, p=st.p)
        st = f(st, jnp.float32(1.0))
    return tmp, case


def test_render_frames_and_video(snapshot_file):
    tmp, case = snapshot_file
    paths = render_frames_from_hdf5(
        tmp / "cavity.h5", tmp / "out", grid=case.grid, progress=False
    )
    assert len(paths["velocity"]) == 3
    assert len(paths["vorticity"]) == 3
    assert all(p.exists() for p in paths["velocity"])
    out = make_video(tmp / "out" / "velocity_frames", tmp / "movie.mp4",
                     duration_s=1.0)
    # no ffmpeg on this rig → gated fallback to GIF
    assert out.exists() and out.stat().st_size > 0


def test_thin_frames(snapshot_file):
    tmp, case = snapshot_file
    d = tmp / "thin"
    d.mkdir(exist_ok=True)
    for i in range(10):
        (d / f"f_{i:03d}.png").write_bytes(b"x")
    r = thin_frames(d, keep_every=3, dry_run=True)
    assert r["deleted"] == 6 and len(list(d.glob("*.png"))) == 10
    r = thin_frames(d, keep_every=3)
    assert len(list(d.glob("*.png"))) == 4


def test_energy_history_plot(tmp_path):
    hist = [{"step": s, "energy": 0.1 * np.exp(-s / 100)} for s in range(0, 500, 50)]
    p = plot_energy_history(hist, tmp_path / "energy.png")
    assert p.exists()


def test_restore_helper(snapshot_file):
    tmp, case = snapshot_file
    st = restore(case.state, tmp / "cavity.h5")
    assert int(st.step) == 100  # latest snapshot
    assert float(st.t) > 0.0
    assert np.any(np.asarray(st.u) != 0)


def test_restore_nested_coupled_state(tmp_path):
    import jax

    from cfdsim_tpu.io_ import SnapshotWriter

    case = transport(n=24, Re=100.0)
    f = jax.jit(lambda s, c: jax.lax.scan(
        lambda st, _: case.step(st, c), s, None, length=20)[0])
    st = f(case.state, jnp.float32(1.0))
    w = SnapshotWriter(tmp_path / "t.h5")
    w.save(int(st.step), float(st.t), u=st.flow.u, v=st.flow.v,
           p=st.flow.p, theta=st.theta)
    restored = restore(case.state, tmp_path / "t.h5")
    np.testing.assert_array_equal(np.asarray(restored.flow.u), np.asarray(st.flow.u))
    np.testing.assert_array_equal(np.asarray(restored.theta), np.asarray(st.theta))
    assert int(restored.flow.step) == int(st.step)


def test_palette_gif(tmp_path):
    # two-pass palette GIF (reference video_generator.jl:32-79 analog):
    # one global palette across frames
    import numpy as np
    from PIL import Image

    from cfdsim_tpu.viz.video import make_video

    fdir = tmp_path / "frames"
    fdir.mkdir()
    for i in range(6):
        arr = (np.linspace(0, 255, 32 * 32).reshape(32, 32) + 20 * i) % 256
        Image.fromarray(arr.astype(np.uint8)).convert("RGB").save(
            fdir / f"f_{i:03d}.png"
        )
    out = make_video(fdir, tmp_path / "anim.gif", duration_s=1.0)
    im = Image.open(out)
    assert im.format == "GIF"
    im.seek(0)
    n = 1
    try:
        while True:
            im.seek(im.tell() + 1)
            n += 1
    except EOFError:
        pass
    assert n == 6


def test_energy_spectrum_parseval_and_peak():
    # Parseval: sum E(k) = mean kinetic energy (k=0 share excluded when
    # the field has zero mean); a single-mode field peaks in its shell
    import numpy as np

    from cfdsim_tpu.validation import energy_spectrum_shells as energy_spectrum, spectrum_slope

    n = 64
    x = np.arange(n) * 2 * np.pi / n
    X, Y = np.meshgrid(x, x, indexing="xy")
    u = np.sin(4 * X) * np.cos(Y)
    v = -0.25 * np.cos(4 * X) * np.sin(Y)
    k, E = energy_spectrum(u, v)
    np.testing.assert_allclose(
        E.sum(), np.mean(0.5 * (u * u + v * v)), rtol=1e-5
    )
    assert k[np.argmax(E)] == 4  # |k| = sqrt(16+1) ~ 4.1 -> shell 4

    # 3D path + slope helper on a synthetic k^-5/3 spectrum
    rng = np.random.default_rng(0)
    w3 = rng.standard_normal((16, 16, 16))
    k3, E3 = energy_spectrum(w3, w3 * 0.5, w3 * 0.25)
    tot = np.mean(0.5 * (w3**2 + 0.25 * w3**2 + 0.0625 * w3**2))
    mean_share = 0.5 * (
        w3.mean() ** 2 + (0.5 * w3).mean() ** 2 + (0.25 * w3).mean() ** 2
    )
    np.testing.assert_allclose(E3.sum(), tot - mean_share, rtol=1e-4)
    ks = np.arange(1, 30)
    assert abs(spectrum_slope(ks, ks ** (-5.0 / 3.0), 2, 20) + 5 / 3) < 1e-6


def test_thin_frames_confirm(snapshot_file):
    """Interactive confirmation (reference cleanup_python.py:72-76):
    a callable confirm is asked once; "n" aborts with nothing deleted,
    "y" proceeds."""
    tmp, _case = snapshot_file
    d = tmp / "thin_confirm"
    d.mkdir(exist_ok=True)
    for i in range(6):
        (d / f"f_{i:03d}.png").write_bytes(b"x")
    asked = []

    r = thin_frames(d, keep_every=3, confirm=lambda q: asked.append(q) or "n")
    assert r["aborted"] and r["deleted"] == 0
    assert len(list(d.glob("*.png"))) == 6 and len(asked) == 1
    r = thin_frames(d, keep_every=3, confirm=lambda q: "y")
    assert r["deleted"] == 4 and len(list(d.glob("*.png"))) == 2
