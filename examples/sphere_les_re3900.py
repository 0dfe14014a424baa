"""Re=3900 sphere LES — the stretched-3D Smagorinsky production study.

The subcritical-sphere benchmark (DNS: Rodriguez et al. 2011 Cd 0.394;
LES: Yun et al. 2006 Cd 0.355; experiments scatter ~0.39-0.5) on the
body+wake-refined stretched MAC tier with the local-Δ Smagorinsky model
(Δ = (hx hy hz)^(1/3)), sharp-mask penalization, TVD convection, and an
inlet perturbation to trip the wake.  This is the script behind the
BENCHNOTES "Re=3900 sphere LES" resolution ladder:

    strength 5,  width 1.2  ->  58 cells/D near-body,  Cd 0.518 (+31%)
    strength 12, width 0.7  ->  91 cells/D near-body,  Cd 0.486 (+23%)

Cd converges toward the DNS band ~1st-order in near-wall resolution;
the remaining bias is the staircase penalization boundary layer
(delta ~= D/sqrt(Re) ~= 1.5 cells even at 91 c/D) setting separation.
Reference LES capability this exercises: v5.py:96-110 (Smagorinsky)
composed with the IBM cylinder habitat v5.py:275-283, taken to 3D.

Run (TPU; ~30 min per t=400 at the defaults):
    python examples/sphere_les_re3900.py --strength 12 --width 0.7 --t 400
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np


def _atomic_savez(path, **arrays):
    """np.savez to a temp file + os.replace: checkpoint is all-or-nothing."""
    tmp = f"{path}.tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def run(nx=320, ny=160, nz=160, strength=12.0, width=0.7, t_final=400.0,
        t_tail=160.0, chunk_steps=200, perturb=0.02, cs=0.17,
        ibm_scheme="penalize", re=3900.0, use_les=True, verbose=True,
        probe_x=2.0, probe_r=0.6, save=None, les_model="smagorinsky",
        resume=False, ckpt_every=5):
    """``probe_x``/``probe_r``: azimuthal wake-velocity probe array —
    4 points at x = center_x + probe_x (downstream), offset ±probe_r
    along y and z. The classic sphere vortex-shedding measurement
    (St ≈ 0.19-0.21 at Re=3900) lives in the wake VELOCITY spectrum;
    the integrated lateral force averages the azimuthal modes out,
    which is why the force-based St here meanders (VERDICT r3)."""
    import jax

    from cfdsim_tpu.cases import build

    case = build(
        "sphere_stretched", nx=nx, ny=ny, nz=nz, Re=re,
        domain=(16.0, 8.0, 8.0), center=(4.0, 4.0, 4.0),
        refine_strength=strength, refine_width=width,
        scheme="tvd", ibm_profile="sharp", ibm_scheme=ibm_scheme,
        perturb=perturb,
        ibm_ramp_steps=200, use_les=use_les, smagorinsky_constant=cs,
        les_model=les_model,
        compute_metrics=True,
    )
    h_min = case.extras["h_min"]
    if verbose:
        print(f"grid {nx}x{ny}x{nz} ({nx * ny * nz / 1e6:.1f}M cells), "
              f"h_min={h_min:.5f} -> {1 / h_min:.0f} cells/D near-body")

    # azimuthal wake probes: nearest cell indices on the stretched grid
    # (state arrays are (nz, ny, nx[+1]) — z, y, x)
    xf, yf, zf = (case.extras[k] for k in ("x_faces", "y_faces", "z_faces"))
    xc_ = 0.5 * (xf[:-1] + xf[1:])
    yc_ = 0.5 * (yf[:-1] + yf[1:])
    zc_ = 0.5 * (zf[:-1] + zf[1:])
    cx, cy, cz = 4.0, 4.0, 4.0  # case center (defaults above)
    px = float(cx + probe_x)
    pts = [(px, cy + probe_r, cz), (px, cy - probe_r, cz),
           (px, cy, cz + probe_r), (px, cy, cz - probe_r)]
    idx = [(int(np.abs(zc_ - z).argmin()), int(np.abs(yc_ - y).argmin()),
            int(np.abs(xc_ - x).argmin())) for x, y, z in pts]

    def probe_sample(s):
        # v at the probe cells (lateral velocity carries the shedding
        # signature); staggered offset ≤ h/2 is irrelevant for spectra
        return jnp.stack([s.v[k, j, i] for (k, j, i) in idx])

    def chunk(state, _):
        def body(s, _):
            s2, m = case.step(s, 1.0)
            return s2, (m.fx, m.fy, m.fz, m.dt, s2.t, probe_sample(s2))

        return jax.lax.scan(body, state, None, length=chunk_steps)

    chunk = jax.jit(chunk)
    state, coeff = case.state, case.extras["coeff_scale"]
    hist_t, hist_cd, hist_cly, hist_clz, hist_pv = [], [], [], [], []
    ckpt_path = f"{save}.state.npz" if save else None
    if resume and ckpt_path and os.path.exists(ckpt_path):
        # rig-wedge insurance (CLAUDE.md "RIG WEDGE MODE"): the relay can
        # wedge mid-call at ~40-min connection age; a state checkpoint
        # every few chunks makes the restart cost minutes, not the run
        d = np.load(ckpt_path)
        state = state._replace(
            u=jnp.asarray(d["u"]), v=jnp.asarray(d["v"]),
            w=jnp.asarray(d["w"]), p=jnp.asarray(d["p"]),
            t=jnp.float32(float(d["t"])), step=jnp.int32(int(d["step"])))
        ser = np.load(save)
        keep = ser["t"] <= float(d["t"]) + 1e-6
        hist_t.append(ser["t"][keep])
        hist_cd.append(ser["cd"][keep])
        hist_cly.append(ser["cly"][keep])
        hist_clz.append(ser["clz"][keep])
        hist_pv.append(ser["probe_v"][keep])
        print(f"resumed from {ckpt_path} at t={float(state.t):.2f} "
              f"({keep.sum()} series rows kept)", flush=True)
    n_chunks_done = 0
    step0 = int(state.step)
    t0 = time.perf_counter()
    while float(state.t) < t_final:
        state, (fx, fy, fz, dt, tt, pv) = chunk(state, None)
        hist_t.append(np.asarray(tt))
        hist_cd.append(np.asarray(fx) * coeff)
        hist_cly.append(np.asarray(fy) * coeff)
        hist_clz.append(np.asarray(fz) * coeff)
        hist_pv.append(np.asarray(pv))
        if verbose:
            el = time.perf_counter() - t0
            print(f"  t={float(state.t):7.2f}  Cd={hist_cd[-1][-1]:6.3f}  "
                  f"Cl=({hist_cly[-1][-1]:+6.3f},{hist_clz[-1][-1]:+6.3f})  "
                  f"[{(float(state.step) - step0) / el:6.1f} steps/s, "
                  f"{el / 60:5.1f} min]", flush=True)
        if not np.isfinite(hist_cd[-1][-1]):
            print("NON-FINITE force — aborting")
            return None
        if save:
            # incremental overwrite every chunk: the tunneled relay can
            # wedge mid-call on ~40-min-old connections (CLAUDE.md "RIG
            # WEDGE MODE"), and an end-only save loses the whole series.
            # Write-then-rename so a kill -9 mid-write (the wedge-recovery
            # recipe) can't leave a truncated .npz.
            _atomic_savez(save, t=np.concatenate(hist_t),
                          cd=np.concatenate(hist_cd),
                          cly=np.concatenate(hist_cly),
                          clz=np.concatenate(hist_clz),
                          probe_v=np.concatenate(hist_pv),
                          probe_pts=np.asarray(pts))
            n_chunks_done += 1
            if ckpt_every and n_chunks_done % ckpt_every == 0:
                _atomic_savez(ckpt_path,
                              u=np.asarray(state.u), v=np.asarray(state.v),
                              w=np.asarray(state.w), p=np.asarray(state.p),
                              t=float(state.t), step=int(state.step))

    t = np.concatenate(hist_t)
    cd = np.concatenate(hist_cd)
    cly = np.concatenate(hist_cly)
    clz = np.concatenate(hist_clz)
    tail = t > t_tail
    cd_mean = float(cd[tail].mean())

    # lateral-force Strouhal from the tail (uniform-time resample; the
    # dominant bin of |FFT(Cl_y)| + |FFT(Cl_z)| — J&P St=0.137 at Re=300)
    tu = np.linspace(t[tail][0], t[tail][-1], int(tail.sum()))
    sy = np.abs(np.fft.rfft(np.interp(tu, t[tail], cly[tail])
                            - cly[tail].mean()))
    sz = np.abs(np.fft.rfft(np.interp(tu, t[tail], clz[tail])
                            - clz[tail].mean()))
    freqs = np.fft.rfftfreq(len(tu), tu[1] - tu[0])
    st = float(freqs[1:][np.argmax((sy + sz)[1:])])  # D = U = 1

    # wake-probe spectra: dominant St per probe + the summed spectrum
    pv = np.concatenate(hist_pv)  # (n_steps, 4)
    band = (freqs > 0.05) & (freqs < 1.0)  # exclude slow meandering
    spec_sum = np.zeros(band.sum())
    st_probe = []
    for p in range(pv.shape[1]):
        s_ = np.abs(np.fft.rfft(np.interp(tu, t[tail], pv[tail, p])
                                - pv[tail, p].mean()))
        st_probe.append(float(freqs[band][np.argmax(s_[band])]))
        spec_sum += s_[band]
    st_wake = float(freqs[band][np.argmax(spec_sum)])

    if save:
        _atomic_savez(save, t=t, cd=cd, cly=cly, clz=clz, probe_v=pv,
                      probe_pts=np.asarray(pts))
        print(f"series saved to {save}")
    print(f"\nRESULT Re={re:g} cells/D={1 / h_min:.0f}  "
          f"Cd_mean(t>{t_tail:.0f})={cd_mean:.4f}"
          + (f"  (DNS 0.394: {100 * (cd_mean / 0.394 - 1):+.1f}%)"
             if re == 3900.0 else "")
          + f"  St_lat={st:.4f}  St_wake={st_wake:.4f} "
          f"(per-probe {', '.join(f'{s_:.3f}' for s_ in st_probe)})  "
          f"Cl_rms=({cly[tail].std():.4f},{clz[tail].std():.4f})")
    return {"cells_per_d": 1 / h_min, "cd_mean": cd_mean, "st": st,
            "st_wake": st_wake, "st_probe": st_probe, "t": t, "cd": cd,
            "probe_v": pv}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=320)
    p.add_argument("--ny", type=int, default=160)
    p.add_argument("--nz", type=int, default=160)
    p.add_argument("--strength", type=float, default=12.0)
    p.add_argument("--width", type=float, default=0.7)
    p.add_argument("--t", type=float, default=400.0)
    p.add_argument("--tail", type=float, default=160.0)
    p.add_argument("--perturb", type=float, default=0.02)
    p.add_argument("--cs", type=float, default=0.17)
    p.add_argument("--ibm", default="penalize",
                   choices=["penalize", "ghost"],
                   help="ghost = sharp-interface ghost-cell direct "
                        "forcing (the wall treatment for the staircase-"
                        "BL drag bias)")
    p.add_argument("--re", type=float, default=3900.0)
    p.add_argument("--no-les", action="store_true",
                   help="laminar/DNS mode (e.g. the Re=300 hairpin rows)")
    p.add_argument("--probe-x", type=float, default=2.0,
                   help="probe plane distance downstream of the center "
                        "(x/D; the shear layer lives at r≈0.5-0.7 for "
                        "x≲3 — put probes outside it for the large-"
                        "scale shedding mode)")
    p.add_argument("--probe-r", type=float, default=0.6,
                   help="probe lateral offset from the wake axis (r/D)")
    p.add_argument("--save", default=None,
                   help="write the force + probe time series to this "
                        ".npz for offline spectral analysis")
    p.add_argument("--les-model", default="smagorinsky",
                   choices=["smagorinsky", "dynamic"],
                   help="subgrid model (dynamic = Germano-Lilly; "
                        "stretched tier masks the IBM body out of the "
                        "contraction)")
    p.add_argument("--resume", action="store_true",
                   help="continue from <save>.state.npz if present "
                        "(wedge-recovery: kill -9, re-probe, relaunch "
                        "with --resume)")
    a = p.parse_args()
    run(nx=a.nx, ny=a.ny, nz=a.nz, strength=a.strength, width=a.width,
        t_final=a.t, t_tail=a.tail, perturb=a.perturb, cs=a.cs,
        ibm_scheme=a.ibm, re=a.re, use_les=not a.no_les,
        probe_x=a.probe_x, probe_r=a.probe_r, save=a.save,
        les_model=a.les_model, resume=a.resume)
