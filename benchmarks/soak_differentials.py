"""Randomized-config differential soak: the fuzz harness behind the fixed
config-sweep tests.

Each mode generates random instrument/bin/combine configurations and runs
the REFERENCE implementation (executed on the xrlite facade, tests/ref_oracle)
against ours on the same inputs, reporting any divergence beyond the
documented budgets.  The fixed seeds in tests/ pin specific shapes forever;
this harness explores the space open-endedly.

Usage (CPU backend; serialize on shared-core rigs):
    PYTHONPATH=. python benchmarks/soak_differentials.py ek60 40
    PYTHONPATH=. python benchmarks/soak_differentials.py ek80 24
    PYTHONPATH=. python benchmarks/soak_differentials.py mvbs 30
    PYTHONPATH=. python benchmarks/soak_differentials.py combine 12

Budgets: EK60/AZFP f64 Sv <1e-9 dB; EK80 BB f64 Sv <7.5e-5 dB (the
reference's own c64 pulse-compression quantization, docs/PERFORMANCE.md);
MVBS <1e-5 dB (f32 device bin partials); clean masks exact outside the
~1e-4 dB threshold-quantization band; combine = group-for-group equality
incl. error parity.

Round-4 session results: ek60 40/40, ek80 24/24, mvbs 30/30 clean;
combine 12/12 after two real fixes it surfaced (facade concat outer-join +
NaN fill for variables absent from some files — mixed angle-presence
combines were silently inconsistent before).
"""

import sys
import pathlib
import tempfile
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _cpu():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def soak_ek60(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from synth_ek60 import write_ek60_raw
    from test_ref_pipeline import _fake, _sv_delta
    from ref_oracle import load_ref

    ref_ek = load_ref("calibrate/calibrate_ek")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        n_pings = int(rng.integers(2, 16))
        n_samples = int(rng.integers(8, 70))
        cfg = dict(n_pings=n_pings, n_samples=n_samples, seed=int(rng.integers(0, 10**6)))
        r = rng.random()
        if r < 0.3:
            cfg["ragged"] = True
        elif r < 0.5:
            cfg["per_channel_samples"] = (
                n_samples, max(4, int(rng.integers(4, n_samples + 1)))
            )
        if rng.random() < 0.4 and n_pings > 2:
            ch = int(rng.integers(1, 3))
            k = int(rng.integers(1, max(2, n_pings // 2)))
            cfg["skip_pings"] = {
                ch: set(int(x) for x in rng.choice(n_pings - 1, size=k, replace=False) + 1)
            }
        if rng.random() < 0.3:
            cfg["with_angle"] = False
        if rng.random() < 0.3:
            cfg["with_nmea"] = False
        raw = tmp / f"S{i}-D20200101-T000000.raw"
        try:
            write_ek60_raw(raw, **cfg)
            ed = ep.open_raw(str(raw), sonar_model="EK60")
            ref_sv = ref_ek.CalibrateEK60(_fake(ed), None, None, None).compute_Sv()
            our_sv = ep.calibrate.compute_Sv(ed, precision="float64")
            delta = _sv_delta(ref_sv, our_sv)
            w = np.asarray(
                ref_sv["Sv"].transpose("channel", "ping_time", "range_sample").values
            )
            g = np.asarray(our_sv["Sv"].values)
            nm = int((np.isnan(g) != np.isnan(w)).sum())
            if delta >= 1e-9 or nm:
                fails += 1
                print(f"FAIL cfg={cfg}: delta={delta} nan_mismatch={nm}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_ek80(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from synth_ek80 import write_ek80_raw, CH_BB
    from test_ref_pipeline import _fake, _sv_delta
    from ref_oracle import load_ref

    ref_ek = load_ref("calibrate/calibrate_ek")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        n_pings = int(rng.integers(2, 10))
        cfg = dict(
            n_pings=n_pings,
            n_samples=int(rng.integers(16, 96)),
            seed=int(rng.integers(0, 10**6)),
            with_power_channel=bool(rng.random() < 0.4),
            with_cw_complex=bool(rng.random() < 0.4),
        )
        if rng.random() < 0.3:
            cfg["complex_f16"] = True
        if rng.random() < 0.3:
            cfg["extra_fm_channel"] = True
        if rng.random() < 0.3:
            cfg["with_raw4"] = True
        if rng.random() < 0.4 and n_pings > 2:
            k = int(rng.integers(1, max(2, n_pings // 2)))
            cfg["skip_pings"] = {
                CH_BB: set(int(x) for x in rng.choice(range(1, n_pings), size=k, replace=False))
            }
        raw = tmp / f"K{i}-D20210201-T000000.raw"
        try:
            write_ek80_raw(raw, **cfg)
            ed = ep.open_raw(str(raw), sonar_model="EK80")
            ref_sv = ref_ek.CalibrateEK80(
                _fake(ed), env_params=None, cal_params=None,
                waveform_mode="BB", encode_mode="complex",
            ).compute_Sv()
            our_sv = ep.calibrate.compute_Sv(
                ed, waveform_mode="BB", encode_mode="complex", precision="float64"
            )
            delta = _sv_delta(ref_sv, our_sv)
            w = np.asarray(
                ref_sv["Sv"].transpose("channel", "ping_time", "range_sample").values
            )
            g = np.asarray(our_sv["Sv"].values)
            nm = int((np.isnan(g) != np.isnan(w)).sum())
            # budget: the f64 BB residual is the REFERENCE's own complex64
            # pulse-compression quantization (docs/PERFORMANCE.md: max
            # 7.3e-5 dB on samples ~60 dB below peak; quantizing our pc
            # identically collapses it to 4e-14)
            if delta >= 7.5e-5 or nm:
                fails += 1
                print(f"FAIL cfg={cfg}: delta={delta} nan_mismatch={nm}", flush=True)
            elif delta >= 5e-6:
                print(f"NOTE cfg={cfg}: delta={delta} within the reference-c64 "
                      f"budget", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_mvbs(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from test_ref_commongrid import _mvbs_oracle
    from test_ref_postprocess import make_sv_ds

    fails = 0
    for i in range(n):
        n_ch = int(rng.integers(1, 4))
        n_ping = int(rng.integers(5, 60))
        n_r = int(rng.integers(10, 80))
        ds = make_sv_ds(
            n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=int(rng.integers(0, 1 << 30))
        )
        sv = np.asarray(ds["Sv"].values)
        sv[rng.random(sv.shape) < rng.uniform(0, 0.25)] = np.nan
        if rng.random() < 0.3 and n_ping > 3:
            sv[:, int(rng.integers(0, n_ping)), :] = np.nan
        er_kind = "grid"
        if rng.random() < 0.5:
            # echo_range fuzz (round 4: interior NaN holes broke the
            # in-kernel binary search; f32 membership flipped edge samples
            # on non-representable grids — both now resolved in host f64)
            er = np.asarray(ds["echo_range"].values, dtype="f8").copy()
            er_kind = []
            if rng.random() < 0.7:
                er[rng.random(er.shape) < 0.06] = np.nan  # interior holes
                er_kind.append("holes")
            if rng.random() < 0.7:
                # per-ping wobble -> non-uniform, non-representable values
                er = er * (1.0 + 0.01 * rng.standard_normal(er.shape[:2])[..., None])
                er_kind.append("wobble")
            elif rng.random() < 0.5:
                # non-f32-representable uniform grid (dz irrational-ish)
                dz = float(rng.uniform(0.3, 0.7))
                er = np.broadcast_to(np.arange(er.shape[2]) * dz, er.shape).copy()
                er_kind.append("irr-grid")
            er_kind = "+".join(er_kind) or "grid"
            ds["echo_range"] = (("channel", "ping_time", "range_sample"), er)
        rb = float(rng.choice([1.0, 2.5, 3.0, 5.0, 7.5]))
        tb = f"{int(rng.integers(2, 15))}s"
        closed = str(rng.choice(["left", "right"]))
        skipna = bool(rng.random() < 0.8)
        if not skipna and n_ping > 3:
            # the campaign-7 regression corner: aggregated-all-NaN bins vs
            # truly-empty bins under a fill_value (whole-NaN ping rows)
            sv[:, int(rng.integers(0, n_ping)), :] = np.nan
        fv = float(rng.choice([np.nan, -999.0, 1e-10]))
        cfg = dict(rb=rb, tb=tb, closed=closed, skipna=skipna, fv=fv,
                   shape=(n_ch, n_ping, n_r), er=er_kind)
        try:
            raw = _mvbs_oracle(ds, rb, tb, closed=closed, skipna=skipna, fill_value=fv)
            want = np.asarray(raw["Sv"].values, dtype="f8")
            got = np.asarray(
                ep.commongrid.compute_MVBS(
                    ds, range_bin=f"{rb}m", ping_time_bin=tb, closed=closed,
                    skipna=skipna, fill_value=fv,
                )["Sv"].values,
                dtype="f8",
            )
            assert got.shape == want.shape, (got.shape, want.shape)
            nm = int((np.isnan(got) != np.isnan(want)).sum())
            m = ~np.isnan(want)
            d = float(np.max(np.abs(got[m] - want[m]))) if m.any() else 0.0
            if nm or d > 1e-5:
                fails += 1
                print(f"FAIL cfg={cfg}: delta={d} nan_mismatch={nm}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_combine(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from synth_ek60 import write_ek60_raw
    from ref_oracle import load_ref_echodata, make_ref_echodata
    from test_ref_echodata import _assert_ds_equal

    layer = load_ref_echodata()
    fails = 0
    for i in range(n):
        tmp = pathlib.Path(tempfile.mkdtemp())
        n_files = int(rng.integers(2, 5))
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        paths, cfgs, off = [], [], 0
        for j in range(n_files):
            cfg = dict(
                n_pings=int(rng.integers(2, 14)),
                n_samples=int(rng.integers(10, 50)),
                seed=int(rng.integers(0, 1 << 30)),
                with_nmea=bool(rng.random() < 0.8),
                with_angle=bool(rng.random() < 0.8),
            )
            if rng.random() < 0.3:
                cfg["ragged"] = True
            raw = tmp / f"C{i}F{j}-D2020010{j + 1}-T000000.raw"
            off += int(rng.integers(60, 2000))
            write_ek60_raw(raw, t0=t0 + np.timedelta64(off, "s"), **cfg)
            paths.append(str(raw))
            cfgs.append(cfg)
        sel = None
        if rng.random() < 0.3:
            sel = ["GPT  18 kHz 009072034d45 1-1 ES18-11"]
        case = dict(i=i, n_files=n_files, sel=bool(sel), cfgs=cfgs)
        try:
            ours = [ep.open_raw(p, sonar_model="EK60") for p in paths]
            theirs = [ep.open_raw(p, sonar_model="EK60") for p in paths]
            ref_eds = [
                make_ref_echodata(
                    {g: ed[g] for g in ed.group_paths}, "EK60", source_file=p
                )
                for ed, p in zip(theirs, paths)
            ]
            ref_err = our_err = None
            ref_comb = our_comb = None
            try:
                ref_comb = layer["combine"].combine_echodata(ref_eds, channel_selection=sel)
            except Exception as e:
                ref_err = f"{type(e).__name__}: {e}"
            try:
                our_comb = ep.combine_echodata(ours, channel_selection=sel)
            except Exception as e:
                our_err = f"{type(e).__name__}: {e}"
            if ref_err or our_err:
                if ref_err != our_err:
                    fails += 1
                    print(
                        f"FAIL error-parity case={case}:\n  ref={ref_err}\n  our={our_err}",
                        flush=True,
                    )
                continue
            assert set(ref_comb.group_paths) == set(our_comb.group_paths)
            for g in sorted(set(ref_comb.group_paths)):
                _assert_ds_equal(
                    ref_comb[g], our_comb[g], g, attrs=(g != "Provenance")
                )
        except Exception as e:
            fails += 1
            print(f"FAIL case={case}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_clean(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from test_ref_clean import make_clean_ds
    from ref_oracle import load_ref

    ref_api = load_ref("clean/api")
    fails = 0
    for i in range(n):
        n_ch = int(rng.integers(1, 4))
        n_ping = int(rng.integers(6, 40))
        n_r = int(rng.integers(10, 60))
        uniform = bool(rng.random() < 0.6)
        ds = make_clean_ds(
            n_ch=n_ch, n_ping=n_ping, n_r=n_r,
            seed=int(rng.integers(0, 1 << 30)), uniform=uniform,
        )
        sv = np.asarray(ds["Sv"].values)
        sv[rng.random(sv.shape) < rng.uniform(0, 0.15)] = np.nan
        if rng.random() < 0.3:
            # interior NaN holes in the depth grid (the round-4 halo fix's
            # failure mode: compacted-index extents under-covered these)
            dep = np.asarray(ds["depth"].values)
            hole = rng.random(dep.shape[-1]) < 0.3
            dep[..., hole] = np.nan
        db = float(rng.choice([2.0, 4.0, 6.0, 9.0]))
        side = int(rng.integers(1, 6))
        thr = float(rng.choice([3.0, 6.0, 10.0]))
        cfg = dict(shape=(n_ch, n_ping, n_r), uniform=uniform, db=db,
                   side=side, thr=thr)
        try:
            kw = dict(func="nanmean", depth_bin=f"{db}m", num_side_pings=side,
                      exclude_above="3.0m",
                      transient_noise_threshold=f"{thr}dB", range_var="depth")
            want = ref_api.mask_transient_noise(ds, **kw)
            got = ep.clean.mask_transient_noise(ds, **kw)
            if not np.array_equal(
                np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
            ):
                fails += 1
                nm = int((np.asarray(got.values, bool) != np.asarray(want.values, bool)).sum())
                print(f"FAIL transient cfg={cfg}: {nm} cells differ", flush=True)
            up_sl = float(rng.choice([5.0, 15.0, 25.0]))
            lo_sl = up_sl + float(rng.choice([10.0, 25.0]))
            kw3 = dict(upper_limit_sl=f"{up_sl}m", lower_limit_sl=f"{lo_sl}m",
                       num_side_pings=min(side, 4),
                       attenuation_signal_threshold=f"{thr}dB", range_var="depth")
            try:
                want3 = ref_api.mask_attenuated_signal(ds, **kw3)
            except ValueError as e:
                # the reference compares upper/lower limit STRINGS before
                # parsing (clean/api.py:320), so numerically valid pairs
                # like "5.0m" < "15.0m" raise lexicographically; ours
                # compares parsed meters (documented divergence)
                if "shorter than maximum" in str(e) and f"{up_sl}m" > f"{lo_sl}m":
                    ep.clean.mask_attenuated_signal(ds, **kw3)
                    print("NOTE attenuated: reference string-compare quirk "
                          f"raised on ({up_sl}m, {lo_sl}m); ours ok", flush=True)
                    continue
                raise
            got3 = ep.clean.mask_attenuated_signal(ds, **kw3)
            if tuple(want3.dims) != tuple(got3.dims):
                want3 = want3.transpose(*got3.dims)
            if not np.array_equal(
                np.asarray(got3.values, dtype=bool), np.asarray(want3.values, dtype=bool)
            ):
                fails += 1
                nm = int((np.asarray(got3.values, bool) != np.asarray(want3.values, bool)).sum())
                print(f"FAIL attenuated cfg={cfg} sl=({up_sl},{lo_sl}): {nm} cells differ", flush=True)
            kw2 = dict(depth_bin=f"{max(2.0, db / 2)}m", num_side_pings=min(side, 3),
                       impulse_noise_threshold=f"{thr}dB", range_var="depth")
            try:
                want2 = ref_api.mask_impulse_noise(ds, **kw2)
            except ValueError as e:
                # the reference's per-ping digitize loop crashes whenever a
                # ping does not touch every depth bin (ping-varying grids /
                # NaN depth holes) — real xarray raises the same conflicting
                # sizes error.  Ours succeeds there (documented divergence);
                # only an OUR-side crash is a failure.
                ep.clean.mask_impulse_noise(ds, **kw2)
                print(f"NOTE impulse: reference crashed, ours ok ({e})", flush=True)
                continue
            got2 = ep.clean.mask_impulse_noise(ds, **kw2)
            if tuple(want2.dims) != tuple(got2.dims):
                want2 = want2.transpose(*got2.dims)
            w2 = np.asarray(want2.values, bool)
            g2 = np.asarray(got2.values, bool)
            if not np.array_equal(g2, w2):
                # classify flips: within ~1e-3 dB of the threshold they are
                # the f32 device bin-mean quantization band (documented
                # budget; measured margins ~1e-4 dB), not logic errors
                from ref_oracle import load_ref as _lr

                ref_utils = _lr("clean/utils")
                _, up = ref_utils.downsample_upsample_along_depth(
                    ds, float(kw2["depth_bin"].rstrip("m")), "depth"
                )
                upv = np.asarray(
                    up.transpose(*got2.dims).values
                    if tuple(up.dims) != tuple(got2.dims)
                    else up.values,
                    dtype="f8",
                )
                thr2 = float(kw2["impulse_noise_threshold"].rstrip("dB"))
                n_bad = 0
                for c2, p2, r2 in np.argwhere(w2 != g2):
                    margins = []
                    if p2 >= 1:
                        margins.append(abs((upv[c2, p2, r2] - upv[c2, p2 - 1, r2]) - thr2))
                    if p2 + 1 < upv.shape[1]:
                        margins.append(abs((upv[c2, p2, r2] - upv[c2, p2 + 1, r2]) - thr2))
                    if not margins or min(margins) > 1e-3:
                        n_bad += 1
                if n_bad:
                    fails += 1
                    print(f"FAIL impulse cfg={cfg}: {n_bad} cells differ beyond the "
                          f"threshold-quantization band", flush=True)
                else:
                    print(f"NOTE impulse: {int((w2 != g2).sum())} flip(s) within the f32 "
                          f"threshold-quantization band", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_nasc(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from test_ref_commongrid import make_nasc_ds
    from ref_oracle import load_ref

    ref_u = load_ref("commongrid/utils")
    from echopype_tpu.commongrid.utils import get_distance_from_latlon

    fails = 0
    for i in range(n):
        n_ch = int(rng.integers(1, 4))
        n_ping = int(rng.integers(8, 60))
        n_r = int(rng.integers(10, 60))
        ds = make_nasc_ds(
            n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=int(rng.integers(0, 1 << 30))
        )
        sv = np.asarray(ds["Sv"].values)
        sv[rng.random(sv.shape) < rng.uniform(0, 0.2)] = np.nan
        dep_kind = "grid"
        if rng.random() < 0.5:
            # depth fuzz: wobble -> ping-varying grid (exact f64 host path),
            # interior NaN holes -> no-bin samples (round-4 hardening)
            dep = np.asarray(ds["depth"].values, dtype="f8").copy()
            dep_kind = []
            if rng.random() < 0.7:
                dep = dep * (1.0 + 0.01 * rng.standard_normal(dep.shape[:2])[..., None])
                dep_kind.append("wobble")
            if rng.random() < 0.5:
                dep[rng.random(dep.shape) < 0.04] = np.nan
                dep_kind.append("holes")
            dep_kind = "+".join(dep_kind) or "grid"
            ds["depth"] = (("channel", "ping_time", "range_sample"), dep)
        dist_bin = float(rng.choice([0.02, 0.05, 0.1]))
        range_bin = float(rng.choice([2.0, 4.0, 7.5]))
        skipna = bool(rng.random() < 0.7)
        if not skipna and n_ping > 3:
            sv[:, int(rng.integers(0, n_ping)), :] = np.nan
        cfg = dict(shape=(n_ch, n_ping, n_r), dist_bin=dist_bin, range_bin=range_bin,
                   depth=dep_kind, skipna=skipna)
        try:
            dist_nmi = np.asarray(get_distance_from_latlon(ds), dtype="f8")
            ds_ref = ds.assign_coords(
                {"distance_nmi": ("ping_time", dist_nmi)}
            ).swap_dims({"ping_time": "distance_nmi"})
            range_edges = np.arange(
                0, np.nanmax(np.asarray(ds["depth"].values)) + range_bin, range_bin
            )
            dist_edges = np.arange(0, np.nanmax(dist_nmi) + dist_bin, dist_bin)
            raw = ref_u.compute_raw_NASC(
                ds_ref,
                ref_u._convert_bins_to_interval_index(range_edges),
                ref_u._convert_bins_to_interval_index(dist_edges),
                skipna=skipna,
            )
            got = ep.commongrid.compute_NASC(
                ds, range_bin=f"{range_bin}m", dist_bin=f"{dist_bin}nmi",
                skipna=skipna,
            )
            want = np.asarray(raw["sv"].values, dtype="f8")
            g = np.asarray(got["NASC"].values, dtype="f8")
            assert g.shape == want.shape, (g.shape, want.shape)
            nm = int((np.isnan(g) != np.isnan(want)).sum())
            both = ~np.isnan(want) & ~np.isnan(g)
            rel = (
                float(np.max(np.abs(g[both] - want[both]) / np.maximum(np.abs(want[both]), 1e-30)))
                if both.any()
                else 0.0
            )
            if nm or rel > 1e-5:
                fails += 1
                print(f"FAIL cfg={cfg}: rel={rel} nan_mismatch={nm}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_azfp(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from synth_azfp import write_azfp_raw, write_azfp_xml
    from ref_oracle import FakeEchoData, load_ref

    ref_mod = load_ref("calibrate/calibrate_azfp")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        cfg = dict(
            n_pings=int(rng.integers(2, 20)),
            seed=int(rng.integers(0, 10**6)),
            averaged=bool(rng.random() < 0.4),
            minute=int(rng.integers(0, 60)),
        )
        env = {
            "salinity": float(rng.uniform(25, 36)),
            "pressure": float(rng.uniform(5, 100)),
            "temperature": float(rng.uniform(2, 20)),
        }
        raw = tmp / f"2301{i:02d}00.01A"
        xml = tmp / f"cfg{i}.xml"
        try:
            write_azfp_raw(raw, **cfg)
            write_azfp_xml(xml)
            ed = ep.open_raw(raw, sonar_model="AZFP", xml_path=str(xml))
            fake = FakeEchoData(
                {p: ed[p] for p in ("Sonar/Beam_group1", "Environment", "Vendor_specific")},
                ed.sonar_model,
            )
            want = ref_mod.CalibrateAZFP(fake, env_params=dict(env)).compute_Sv()
            got = ep.calibrate.compute_Sv(ed, env_params=dict(env))
            w_da = want["Sv"]
            if tuple(w_da.dims) != tuple(got["Sv"].dims):
                w_da = w_da.transpose(*got["Sv"].dims)
            w = np.asarray(w_da.values, dtype="f8")
            g = np.asarray(got["Sv"].values, dtype="f8")
            nm = int((np.isnan(g) != np.isnan(w)).sum())
            m = ~np.isnan(w)
            d = float(np.max(np.abs(g[m] - w[m]))) if m.any() else 0.0
            if nm or d > 1e-9:
                fails += 1
                print(f"FAIL cfg={cfg}: delta={d} nan_mismatch={nm}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_detectors(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from test_ref_detectors import make_bottom_ds
    from test_ref_postprocess import make_sv_ds
    from ref_oracle import load_ref

    def random_shoal_ds(n_ping, n_r, seed):
        # Quiet background with a random number of dense blobs + specks,
        # scaled to the sampled shape (the tests/ helper hardcodes blob
        # positions that need n_ping>=36, n_r>=45).
        ds = make_sv_ds(n_ch=2, n_ping=n_ping, n_r=n_r, seed=seed)
        r2 = np.random.default_rng(seed ^ 0x5A5A)
        sv = np.asarray(ds["Sv"].values)
        sv[:] = r2.normal(-88.0, 2.0, sv.shape)
        for _ in range(int(r2.integers(1, 4))):
            h = int(r2.integers(2, max(3, n_ping // 3)))
            w = int(r2.integers(2, max(3, n_r // 4)))
            p0 = int(r2.integers(0, max(1, n_ping - h)))
            s0 = int(r2.integers(0, max(1, n_r - w)))
            sv[:, p0:p0 + h, s0:s0 + w] = r2.normal(-56.0, 2.0, (2, h, w))
        for _ in range(int(r2.integers(0, 3))):
            sv[:, int(r2.integers(0, n_ping)), int(r2.integers(0, n_r))] = -50.0
        return ds

    ref_basic = load_ref("mask/seafloor_detection/bottom_basic")
    ref_bw = load_ref("mask/seafloor_detection/bottom_blackwell")
    ref_w = load_ref("mask/shoal_detection/shoal_weill")
    ref_e = load_ref("mask/shoal_detection/shoal_echoview")
    fails = 0
    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        n_ping = int(rng.integers(10, 50))
        n_r = int(rng.integers(30, 100))
        bidx = int(rng.integers(n_r // 2, n_r - 8))
        ds = make_bottom_ds(n_ch=2, n_ping=n_ping, n_r=n_r, bottom_idx=bidx, seed=seed)
        cfg = dict(seed=seed, n_ping=n_ping, n_r=n_r, bidx=bidx)
        try:
            kw = dict(var_name="Sv", channel="ch0",
                      threshold=(float(rng.uniform(-50, -35)), float(rng.uniform(-20, -5))),
                      offset_m=float(rng.choice([0.0, 0.2, 0.5])),
                      bin_skip_from_surface=int(rng.integers(1, 15)))
            want = ref_basic.bottom_basic(ds, **kw)
            got = ep.mask.detect_seafloor(ds, method="basic", params=kw)
            w = np.asarray(want.values, dtype="f8"); g = np.asarray(got.values, dtype="f8")
            if not (np.array_equal(np.isnan(w), np.isnan(g)) and np.allclose(
                    np.nan_to_num(w), np.nan_to_num(g), rtol=0, atol=0)):
                fails += 1
                print(f"FAIL basic cfg={cfg} kw={kw}", flush=True)
            rng2 = np.random.default_rng(seed + 1)
            sv = np.asarray(ds["Sv"].values)
            th = rng2.normal(0.0, 2.0, sv.shape); ph = rng2.normal(0.0, 2.0, sv.shape)
            th[:, :, bidx:] += 14.0; ph[:, :, bidx:] += 14.0
            ds["angle_alongship"] = (("channel", "ping_time", "range_sample"), th)
            ds["angle_athwartship"] = (("channel", "ping_time", "range_sample"), ph)
            kwb = dict(var_name="Sv", channel="ch0",
                       threshold=(-60.0, 40.0, 40.0),
                       offset=float(rng.choice([0.0, 0.3])),
                       r0=2.0, r1=float(min(40.0, n_r * 0.5 - 2)),
                       wtheta=int(rng.choice([3, 5])), wphi=int(rng.choice([5, 7])))
            want = ref_bw.bottom_blackwell(ds, **kwb)
            got = ep.mask.detect_seafloor(ds, method="blackwell", params=kwb)
            w = np.asarray(want.values, dtype="f8"); g = np.asarray(got.values, dtype="f8")
            if not (np.array_equal(np.isnan(w), np.isnan(g)) and np.allclose(
                    np.nan_to_num(w), np.nan_to_num(g), rtol=0, atol=0)):
                fails += 1
                print(f"FAIL blackwell cfg={cfg} kw={kwb}", flush=True)
            sh = random_shoal_ds(n_ping=max(n_ping, 12), n_r=max(n_r, 16), seed=seed)
            kws = dict(var_name="Sv", channel="ch0", thr=float(rng.uniform(-75, -60)),
                       maxvgap=int(rng.integers(0, 4)), maxhgap=int(rng.integers(0, 3)),
                       minvlen=int(rng.integers(1, 5)), minhlen=int(rng.integers(1, 5)))
            want = ref_w.shoal_weill(sh, **kws)
            got = ep.mask.detect_shoal(sh, method="weill", params=kws)
            if tuple(want.dims) != tuple(got.dims):
                want = want.transpose(*got.dims)
            if not np.array_equal(np.asarray(got.values, bool), np.asarray(want.values, bool)):
                fails += 1
                print(f"FAIL weill cfg={cfg} kw={kws}", flush=True)
            # edge vectors: length n+1 (the reference indexes idim[max(idx)+1])
            idim = np.arange(sh.sizes["range_sample"] + 1) * 0.5
            jdim = np.arange(sh.sizes["ping_time"] + 1) * 1.0
            kwe = dict(var_name="Sv", channel="ch0", idim=idim, jdim=jdim,
                       thr=float(rng.uniform(-75, -60)),
                       mincan=(float(rng.choice([0.5, 1.0])), float(rng.choice([1.0, 2.0]))),
                       maxlink=(float(rng.choice([1.0, 2.0])), float(rng.choice([2.0, 3.0]))),
                       minsho=(float(rng.choice([1.0, 2.0])), float(rng.choice([2.0, 3.0]))))
            want = ref_e.shoal_echoview(sh, **kwe)
            got = ep.mask.detect_shoal(sh, method="echoview", params=kwe)
            if tuple(want.dims) != tuple(got.dims):
                want = want.transpose(*got.dims)
            if not np.array_equal(np.asarray(got.values, bool), np.asarray(want.values, bool)):
                fails += 1
                print(f"FAIL echoview cfg={cfg} kw={kwe}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_consolidate(n, rng):
    import numpy as np
    import echopype_tpu as ep
    from synth_ek60 import write_ek60_raw
    from ref_oracle import FakeEchoData, load_ref

    ref_c = load_ref("consolidate/api")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        n_pings = int(rng.integers(3, 18))
        n_samples = int(rng.integers(16, 90))
        cfg = dict(seed=seed, n_pings=n_pings, n_samples=n_samples,
                   ragged=bool(rng.random() < 0.3),
                   with_nmea=bool(rng.random() < 0.9))
        path = tmp / f"CONS{i}-D20200101-T000000.raw"
        try:
            write_ek60_raw(path, n_pings=n_pings, n_samples=n_samples, seed=seed,
                           with_angle=True, with_nmea=cfg["with_nmea"],
                           ragged=cfg["ragged"])
            ed = ep.open_raw(path, sonar_model="EK60")
            r2 = np.random.default_rng(seed ^ 0xC0)

            # Randomize the Platform/Beam inputs the three add_depth group
            # branches consume (vertical offsets, pitch/roll, beam directions),
            # with NaN pings sprinkled in.
            plat = ed["Platform"]
            t2 = plat.coords["time2"].values if "time2" in plat.coords else None
            if t2 is not None and len(np.atleast_1d(t2)):
                m = len(np.atleast_1d(t2))
                for nm, scale in (("pitch", 8.0), ("roll", 6.0),
                                  ("vertical_offset", 1.5), ("water_level", 2.0)):
                    v = r2.normal(0.0, scale, m)
                    v[r2.random(m) < 0.15] = np.nan
                    if nm in plat:
                        plat[nm] = (plat[nm].dims, v.reshape(plat[nm].shape)
                                    if plat[nm].ndim else np.float64(v[0]))
            beam = ed["Sonar/Beam_group1"]
            n_ch = len(np.atleast_1d(beam.coords["channel"].values))
            bx = r2.normal(0.0, 0.3, n_ch)
            by = r2.normal(0.0, 0.3, n_ch)
            bz = np.abs(r2.normal(2.0, 0.5, n_ch))
            if n_ch > 1 and r2.random() < 0.5:
                bx[-1] = by[-1] = bz[-1] = 0.0  # zero-norm edge case
            for nm, v in (("beam_direction_x", bx), ("beam_direction_y", by),
                          ("beam_direction_z", bz)):
                beam[nm] = (("channel",), v)

            groups = {}
            for g in ("Sonar", "Environment", "Vendor_specific", "Platform",
                      "Platform/NMEA", "Sonar/Beam_group1"):
                try:
                    groups[g] = ed[g]
                except KeyError:
                    pass
            fake = FakeEchoData(groups, "EK60")
            ds = ep.calibrate.compute_Sv(ed)

            def cmp(tag, want, got, vars_, rtol=1e-12, atol=1e-12):
                nonlocal fails
                for var in vars_:
                    w = np.asarray(want[var].values, dtype="f8")
                    g_ = np.asarray(got[var].values, dtype="f8")
                    if not (w.shape == g_.shape and np.allclose(
                            g_, w, rtol=rtol, atol=atol, equal_nan=True)):
                        fails += 1
                        bad = (~np.isclose(g_, w, rtol=rtol, atol=atol,
                                           equal_nan=True)).sum()
                        print(f"FAIL {tag} var={var} cfg={cfg} bad={bad} "
                              f"shapes={g_.shape}/{w.shape}", flush=True)

            def run_pair(tag, fn_kwargs, ours_kwargs=None):
                nonlocal fails
                ours_kwargs = fn_kwargs if ours_kwargs is None else ours_kwargs
                werr = gerr = None
                want = got = None
                try:
                    want = getattr(ref_c, tag)(ds.copy(), **fn_kwargs)
                except Exception as e:
                    werr = e
                try:
                    got = getattr(ep.consolidate, tag)(ds.copy(), **ours_kwargs)
                except Exception as e:
                    gerr = e
                if (werr is None) != (gerr is None):
                    fails += 1
                    print(f"FAIL {tag} error-parity cfg={cfg} ref={werr!r} "
                          f"ours={gerr!r}", flush=True)
                    return None, None
                if werr is not None:
                    if type(werr) is not type(gerr):
                        fails += 1
                        print(f"FAIL {tag} error-type cfg={cfg} ref={werr!r} "
                              f"ours={gerr!r}", flush=True)
                    return None, None
                return want, got

            # add_depth: explicit offset/tilt and each group-branch flag
            kw = dict(depth_offset=float(r2.uniform(-3, 8)),
                      tilt=float(r2.uniform(0, 50)),
                      downward=bool(r2.random() < 0.8))
            want, got = run_pair("add_depth", kw)
            if want is not None:
                cmp(f"add_depth {kw}", want, got, ["depth"], atol=0)
            for flag in ("use_platform_vertical_offsets", "use_platform_angles",
                         "use_beam_angles"):
                want, got = run_pair(
                    "add_depth",
                    dict(echodata=fake, **{flag: True}),
                    dict(echodata=ed, **{flag: True}),
                )
                if want is not None:
                    cmp(f"add_depth {flag}", want, got, ["depth"], atol=0)

            # add_location (plain + GGA-filtered); files without NMEA must
            # error identically
            for loc_kw in (dict(), dict(nmea_sentence="GGA")):
                want, got = run_pair(
                    "add_location", dict(echodata=fake, **loc_kw),
                    dict(echodata=ed, **loc_kw))
                if want is not None:
                    cmp(f"add_location {loc_kw}", want, got,
                        ["latitude", "longitude"])

            # split-beam angles (power path)
            want, got = run_pair(
                "add_splitbeam_angle",
                dict(echodata=fake, waveform_mode="CW", encode_mode="power",
                     to_disk=False),
                dict(echodata=ed, waveform_mode="CW", encode_mode="power",
                     to_disk=False))
            if want is not None:
                cmp("add_splitbeam_angle", want, got,
                    ["angle_alongship", "angle_athwartship"], rtol=1e-10)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_survey(n, rng):
    """Fused survey streamers vs the composed chain on random configs.

    The composed side (per-file compute_Sv -> clean masks / freq_diff mask ->
    run_survey_mvbs over datasets) is itself reference-verified; this fuzzes
    the round-4 fusion work — raw->MVBS two-pass noise masks, fused
    freq_diff, chunk boundaries, multi-file unions, NASC mask fusion and the
    uniform/non-uniform grid kernel variants — against it on random shapes.
    """
    import numpy as np
    import echopype_tpu as ep
    from echopype_tpu.parallel.survey import (
        run_survey_mvbs, run_survey_mvbs_from_raw, run_survey_nasc,
    )
    from synth_ek60 import write_ek60_raw
    from test_ref_commongrid import make_nasc_ds
    from test_survey_clean import _masked_copy

    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0

    # Budget decomposition (measured, campaign seed 501 + f64-truth repro):
    # the fused in-kernel Sv (one exp over a sum of four f32 terms) sits
    # <=2e-5 dB from the f64 truth while the composed chain's binned
    # compute_Sv f32 sits <=5e-6 dB — the fused formulation accumulates its
    # pre-exp roundings once instead of re-rounding through a stored f32 Sv.
    # Cross-side distance is bounded by the sum: originally 3e-5 plain;
    # seed 898553117 (3 ragged files, 5.6 m bins) measured 3.44e-5 with the
    # same signature (value-only, zero NaN flips, ~8e-9 relative linear) and
    # reproduces identically on the pre-rewrite binning code, so the plain
    # budget is now the measured 4e-5.  Masked legs: 5e-5 (mask-induced
    # sample-set changes add relative f32 bin-sum noise).  NaN-masks must
    # still match EXACTLY.
    def cmp(tag, got, want, cfg, var="Sv", atol=4e-5):
        nonlocal fails
        g = np.asarray(got[var].values, dtype="f8")
        w = np.asarray(want[var].values, dtype="f8")
        if g.shape != w.shape:
            fails += 1
            print(f"FAIL {tag} shape {g.shape} vs {w.shape} cfg={cfg}", flush=True)
            return
        if not np.array_equal(np.isnan(g), np.isnan(w)):
            fails += 1
            print(f"FAIL {tag} NaN-mask {np.sum(np.isnan(g) != np.isnan(w))} "
                  f"cells cfg={cfg}", flush=True)
            return
        d = np.abs(np.nan_to_num(g) - np.nan_to_num(w))
        if d.max() > atol:
            fails += 1
            print(f"FAIL {tag} max|d|={d.max():.3e} cfg={cfg}", flush=True)

    def random_mask_spec(r2, range_var):
        spec = {}
        if r2.random() < 0.6:
            spec["impulse"] = dict(
                depth_bin=f"{float(r2.uniform(2, 6)):.1f}m",
                num_side_pings=int(r2.integers(1, 4)),
                impulse_noise_threshold=f"{float(r2.uniform(6, 14)):.1f}dB",
                range_var=range_var)
        if r2.random() < 0.6:
            spec["attenuated"] = dict(
                upper_limit_sl=f"{float(r2.uniform(4, 12)):.1f}m",
                lower_limit_sl=f"{float(r2.uniform(18, 40)):.1f}m",
                num_side_pings=int(r2.integers(2, 5)),
                attenuation_signal_threshold=f"{float(r2.uniform(3, 8)):.1f}dB",
                range_var=range_var)
        if range_var == "depth" and r2.random() < 0.5:
            spec["transient"] = dict(
                func=str(r2.choice(["nanmean", "nanmedian"])),
                depth_bin=f"{float(r2.uniform(4, 8)):.1f}m",
                num_side_pings=int(r2.integers(2, 5)),
                exclude_above=f"{float(r2.uniform(1, 4)):.1f}m",
                transient_noise_threshold=f"{float(r2.uniform(5, 10)):.1f}dB",
                range_var=range_var)
        return spec

    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        n_files = int(rng.integers(1, 4))
        n_pings = int(rng.integers(8, 36))
        n_samples = int(rng.integers(30, 130))
        kw = dict(
            range_bin_m=float(rng.uniform(3.5, 24.0)) + 0.137,
            ping_time_bin=str(rng.choice(["3s", "5s", "10s"])),
            chunk_pings=int(rng.integers(3, 18)),
        )
        cfg = dict(seed=seed, n_files=n_files, n_pings=n_pings,
                   n_samples=n_samples, **kw)
        try:
            t0 = np.datetime64("2020-01-01T00:00:00", "ns")
            files = []
            for k in range(n_files):
                raw = tmp / f"SV{i}_{k}-D20200101-T000000.raw"
                fkw = {}
                if r2.random() < 0.25:
                    fkw["ragged"] = True
                if r2.random() < 0.25 and n_pings > 4:
                    m = int(r2.integers(1, max(2, n_pings // 3)))
                    fkw["skip_pings"] = {1: set(
                        int(x) for x in r2.choice(range(1, n_pings), size=m,
                                                  replace=False))}
                write_ek60_raw(raw, n_pings=n_pings, n_samples=n_samples,
                               seed=seed + k, t0=t0 + np.timedelta64(
                                   k * (n_pings + 5), "s"), **fkw)
                files.append(str(raw))
            sv_files = [
                ep.calibrate.compute_Sv(ep.open_raw(f, sonar_model="EK60"),
                                        precision="float32")
                for f in files
            ]

            # 1: plain raw->MVBS vs composed datasets
            got = run_survey_mvbs_from_raw(files, sonar_model="EK60", **kw)
            want = run_survey_mvbs(sv_files, **kw)
            cmp("plain", got, want, cfg)

            # 2: fused noise masks vs per-file masked composition
            spec = random_mask_spec(r2, "echo_range")
            if spec:
                got = run_survey_mvbs_from_raw(
                    files, sonar_model="EK60", noise_masks=spec, **kw)
                want = run_survey_mvbs([_masked_copy(d, spec) for d in sv_files],
                                       **kw)
                cmp(f"noise_masks {sorted(spec)}", got, want, cfg)

            # 3: fused freq_diff vs masked composition
            chans = [str(c) for c in
                     sv_files[0].coords["channel"].values]
            eq = (f'"{chans[0]}" - "{chans[1]}" '
                  f'{r2.choice([">", "<", ">=", "<="])} '
                  f"{float(r2.uniform(0, 4)):.2f}dB")  # grammar: dB >= 0 only
            got = run_survey_mvbs_from_raw(
                files, sonar_model="EK60", freq_diff=eq, **kw)
            masked = []
            for d in sv_files:
                m = ep.mask.frequency_differencing(d, chanABEq=eq)
                masked.append(ep.mask.apply_mask(d, m))
            want = run_survey_mvbs(masked, **kw)
            # fused in-kernel Sv and compute_Sv f32 are two roundings of the
            # same math; with a mask the surviving sample sets shrink, so
            # bin sums carry a bit more relative f32 noise than plain MVBS
            cmp(f"freq_diff {eq!r}", got, want, cfg, atol=5e-5)

            # 4: NASC mask fusion on random (possibly non-uniform) grids
            nasc_files = []
            for k in range(n_files):
                d = make_nasc_ds(n_ch=2, n_ping=n_pings, n_r=max(16, n_samples // 3),
                                 seed=seed + 7 * k)
                pt = np.asarray(d.coords["ping_time"].values) + np.timedelta64(
                    k * (n_pings + 5), "s")
                d.coords["ping_time"].values = pt
                if r2.random() < 0.4:
                    # break grid uniformity so the dense/non-uniform kernel
                    # variant runs instead of the uniform fast path
                    dp = np.asarray(d["depth"].values)
                    d["depth"] = (d["depth"].dims,
                                  dp * (1.0 + 0.03 * np.sin(np.arange(dp.shape[-1]))))
                sv = np.asarray(d["Sv"].values)
                sv[0, int(r2.integers(0, n_pings)), :] += 30.0
                sv[0, n_pings // 2:n_pings // 2 + 3, 5:15] -= 25.0
                nasc_files.append(d)
            nkw = dict(range_bin=f"{float(r2.uniform(2.5, 8.0)):.2f}m",
                       dist_bin=f"{float(r2.uniform(0.01, 0.08)):.3f}nmi",
                       chunk_pings=int(r2.integers(4, 20)))
            nspec = random_mask_spec(r2, "depth")
            if nspec:
                got = run_survey_nasc(nasc_files, noise_masks=nspec, **nkw)
                want = run_survey_nasc([_masked_copy(d, nspec) for d in nasc_files],
                                       **nkw)
                cmp(f"nasc {sorted(nspec)}", got, want, cfg, var="NASC",
                    atol=1e-3)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()

        # 5: other-instrument from_raw legs (AZFP affine echo_range with the
        # r0 intercept; EK80 CW/power) on a rotating schedule
        try:
            if i % 3 == 1:
                from synth_azfp import write_azfp_raw, write_azfp_xml

                xml = tmp / f"inst{i}.XML"
                write_azfp_xml(xml)
                afiles = []
                for k in range(int(r2.integers(1, 3))):
                    f = tmp / f"AZ{i}_{k}.01A"
                    write_azfp_raw(f, n_pings=int(r2.integers(4, 12)),
                                   seed=seed + k, minute=10 + 2 * k)
                    afiles.append(str(f))
                env = {"salinity": float(r2.uniform(28, 35)),
                       "pressure": float(r2.uniform(10, 120))}
                akw = dict(range_bin_m=float(r2.uniform(1.5, 6.0)) + 0.07,
                           ping_time_bin=str(r2.choice(["2s", "5s"])),
                           chunk_pings=int(r2.integers(2, 7)))
                got = run_survey_mvbs_from_raw(
                    afiles, sonar_model="AZFP", xml_path=str(xml),
                    env_params=env, **akw)
                asv = [ep.calibrate.compute_Sv(
                    ep.open_raw(f, sonar_model="AZFP", xml_path=str(xml)),
                    env_params=env, precision="float32") for f in afiles]
                want = run_survey_mvbs(asv, **akw)
                cmp(f"azfp {akw['ping_time_bin']}", got, want,
                    dict(cfg, leg="azfp"))
            if i % 3 == 2:
                from synth_ek80 import write_ek80_raw

                f = tmp / f"E80{i}-D20210201-T000000.raw"
                write_ek80_raw(f, n_pings=int(r2.integers(6, 20)),
                               n_samples=int(r2.integers(40, 120)), seed=seed,
                               with_cw_complex=bool(r2.random() < 0.5))
                ekw = dict(range_bin_m=float(r2.uniform(3.0, 12.0)) + 0.11,
                           ping_time_bin=str(r2.choice(["3s", "5s"])),
                           chunk_pings=int(r2.integers(3, 9)))
                got = run_survey_mvbs_from_raw([str(f)], sonar_model="EK80", **ekw)
                esv = ep.calibrate.compute_Sv(
                    ep.open_raw(str(f), sonar_model="EK80"),
                    waveform_mode="CW", encode_mode="power",
                    precision="float32")
                want = run_survey_mvbs([esv], **ekw)
                cmp(f"ek80-power {ekw['ping_time_bin']}", got, want,
                    dict(cfg, leg="ek80"))
        except Exception as e:
            fails += 1
            print(f"ERROR other-instrument leg cfg={cfg}: {type(e).__name__}: {e}",
                  flush=True)
            traceback.print_exc()
    return fails


def soak_regrid(n, rng):
    """regrid_mask + apply_mask/frequency_differencing vs the reference on
    random grids: NaN holes, per-ping-varying range, ragged bin fits, both
    logical-AND/OR, dim orders, and multi-channel apply broadcasting."""
    import numpy as np
    import echopype_tpu as ep
    from echopype_tpu.xrlite import DataArray
    from test_ref_commongrid import make_sv_ds
    from ref_oracle import load_ref

    ref_mask = load_ref("mask/api")
    fails = 0
    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        n_ping = int(r2.integers(5, 50))
        n_r = int(r2.integers(8, 80))
        cfg = dict(seed=seed, n_ping=n_ping, n_r=n_r)
        try:
            pt = (np.datetime64("2022-01-01T00:00:00", "ns")
                  + (np.arange(n_ping) * int(r2.integers(1, 4))).astype(
                      "timedelta64[s]").astype("timedelta64[ns]"))
            dz = float(r2.uniform(0.3, 2.5))
            depth = np.arange(n_r) * dz + float(r2.uniform(0, 3))
            mask_np = r2.uniform(size=(n_ping, n_r)) > float(r2.uniform(0.2, 0.8))
            mask = DataArray(mask_np, ("ping_time", "depth"),
                             coords={"ping_time": pt, "depth": depth},
                             name="mask")
            rng_np = np.broadcast_to(depth, (n_ping, n_r)).copy()
            if r2.random() < 0.4:  # per-ping wobble
                rng_np = rng_np * (1.0 + 0.02 * r2.standard_normal((n_ping, 1)))
            if r2.random() < 0.4:  # NaN holes
                hole = r2.random((n_ping, n_r)) < 0.05
                rng_np = np.where(hole, np.nan, rng_np)
            range_da = DataArray(rng_np, ("ping_time", "depth"),
                                 coords={"ping_time": pt}, name="depth")
            rb = f"{float(r2.uniform(1.5, 12.0)):.2f}m"
            tb = f"{int(r2.integers(2, 15))}s"
            for func in ("logical-AND", "logical-OR"):
                want = ref_mask.regrid_mask(mask, range_da, range_bin=rb,
                                            ping_time_bin=tb, func=func)
                got = ep.mask.regrid_mask(mask, range_da, range_bin=rb,
                                          ping_time_bin=tb, func=func)
                w = np.asarray(want.values); g = np.asarray(got.values)
                if g.shape != w.shape:
                    w = np.asarray(want.transpose(*got.dims).values)
                if not np.array_equal(g.astype("f8"), w.astype("f8")):
                    fails += 1
                    print(f"FAIL regrid {func} {rb}/{tb} "
                          f"{int(np.sum(g != w))} cells cfg={cfg}", flush=True)

            # apply_mask on a multi-channel Sv with the 2-D mask
            ds = make_sv_ds(n_ch=2, n_ping=n_ping, n_r=n_r, seed=seed % 9973)
            m2 = DataArray(mask_np, ("ping_time", "range_sample"),
                           coords={"ping_time": np.asarray(ds.coords["ping_time"].values),
                                   "range_sample": np.arange(n_r)},
                           name="mask")
            want = ref_mask.apply_mask(ds, m2)
            got = ep.mask.apply_mask(ds, m2)
            w = np.asarray(want["Sv"].values, "f8")
            g = np.asarray(got["Sv"].values, "f8")
            if not (np.array_equal(np.isnan(g), np.isnan(w))
                    and np.allclose(np.nan_to_num(g), np.nan_to_num(w),
                                    atol=0, rtol=0)):
                fails += 1
                print(f"FAIL apply_mask cfg={cfg}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_survey_bb(n, rng):
    """EK80 complex/BB fused streamers vs the composed chain on random
    configs: chunked and device_fused, per-channel ping dropouts, f16
    complex payloads, an extra FM channel, CW-complex coexistence, and the
    fused BB freq_diff leg.  Budgets: the device_fused path is f32 end to
    end (documented ~1e-3 dB class vs the chunked f32 path on faint tails;
    PERFORMANCE.md error budget), the chunked path shares compute_Sv's
    f32 kernels exactly."""
    import numpy as np
    import echopype_tpu as ep
    from echopype_tpu.parallel.survey import (
        run_survey_mvbs, run_survey_mvbs_from_raw,
    )
    from synth_ek80 import write_ek80_raw

    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0

    def cmp(tag, got, want, cfg, atol):
        nonlocal fails
        g = np.asarray(got["Sv"].values, dtype="f8")
        w = np.asarray(want["Sv"].values, dtype="f8")
        if g.shape != w.shape:
            fails += 1
            print(f"FAIL {tag} shape {g.shape} vs {w.shape} cfg={cfg}", flush=True)
            return
        if not np.array_equal(np.isnan(g), np.isnan(w)):
            fails += 1
            print(f"FAIL {tag} NaN-mask {np.sum(np.isnan(g) != np.isnan(w))} "
                  f"cells cfg={cfg}", flush=True)
            return
        d = np.abs(np.nan_to_num(g) - np.nan_to_num(w))
        if d.max() > atol:
            fails += 1
            print(f"FAIL {tag} max|d|={d.max():.3e} cfg={cfg}", flush=True)

    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        n_files = int(r2.integers(1, 3))
        n_pings = int(r2.integers(6, 18))
        n_samples = int(r2.integers(48, 140))
        fkw = dict(
            with_power_channel=False,
            with_cw_complex=bool(r2.random() < 0.5),
            complex_f16=bool(r2.random() < 0.3),
            extra_fm_channel=bool(r2.random() < 0.3),
        )
        if r2.random() < 0.35 and n_pings > 4:
            from synth_ek80 import CH_BB
            m = int(r2.integers(1, max(2, n_pings // 4)))
            # keyed by channel-id string (a previous `{0: ...}` form silently
            # no-opped: write_ek80_raw looks up skip_pings by channel id)
            fkw["skip_pings"] = {CH_BB: set(
                int(x) for x in r2.choice(range(1, n_pings), size=m,
                                          replace=False))}
        kw = dict(
            range_bin_m=float(r2.uniform(3.0, 12.0)) + 0.13,
            ping_time_bin=str(r2.choice(["3s", "5s"])),
            chunk_pings=int(r2.integers(3, 9)),
        )
        cfg = dict(seed=seed, n_files=n_files, n_pings=n_pings,
                   n_samples=n_samples,
                   **{k: v for k, v in fkw.items() if k != "skip_pings"},
                   skips=sum(len(v) for v in fkw.get("skip_pings", {}).values()),
                   **kw)
        try:
            t0 = np.datetime64("2021-02-01T00:00:00", "ns")
            files = []
            for k in range(n_files):
                raw = tmp / f"BB{i}_{k}-D20210201-T000000.raw"
                write_ek80_raw(raw, n_pings=n_pings, n_samples=n_samples,
                               seed=seed + k,
                               t0=t0 + np.timedelta64(k * (n_pings + 4), "s"),
                               **fkw)
                files.append(str(raw))
            svs = [ep.calibrate.compute_Sv(
                ep.open_raw(f, sonar_model="EK80"), waveform_mode="BB",
                encode_mode="complex", precision="float32") for f in files]
            want = run_survey_mvbs(svs, **kw)
            got = run_survey_mvbs_from_raw(
                files, sonar_model="EK80", waveform_mode="BB",
                encode_mode="complex", **kw)
            cmp("bb chunked", got, want, cfg, atol=3e-5)
            gotf = run_survey_mvbs_from_raw(
                files, sonar_model="EK80", waveform_mode="BB",
                encode_mode="complex", device_fused=True, **kw)
            cmp("bb device_fused", gotf, want, cfg, atol=5e-3)

            chans = [str(c) for c in svs[0].coords["channel"].values]
            if len(chans) >= 2:
                eq = (f'"{chans[0]}" - "{chans[1]}" '
                      f'{r2.choice([">", "<="])} {float(r2.uniform(0, 3)):.2f}dB')
                gotq = run_survey_mvbs_from_raw(
                    files, sonar_model="EK80", waveform_mode="BB",
                    encode_mode="complex", freq_diff=eq, **kw)
                masked = [ep.mask.apply_mask(
                    d, ep.mask.frequency_differencing(d, chanABEq=eq))
                    for d in svs]
                cmp(f"bb freq_diff {eq!r}", gotq, run_survey_mvbs(masked, **kw),
                    cfg, atol=5e-5)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_metrics(n, rng):
    """Urmy summary statistics + QC time repair vs the reference on random
    shapes, NaN layouts, nonuniform echo_range, and reversed-time pings."""
    import numpy as np
    import echopype_tpu as ep
    from test_ref_postprocess import make_sv_ds
    from ref_oracle import load_ref

    ref_m = load_ref("metrics/summary_statistics")
    ref_qc = load_ref("qc/api")
    fails = 0
    names = ("abundance", "center_of_mass", "dispersion", "evenness",
             "aggregation")
    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        n_ch = int(r2.integers(1, 4))
        n_ping = int(r2.integers(3, 40))
        n_r = int(r2.integers(5, 60))
        cfg = dict(seed=seed, n_ch=n_ch, n_ping=n_ping, n_r=n_r)
        try:
            ds = make_sv_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r)
            sv = np.asarray(ds["Sv"].values).copy()
            sv += r2.normal(0, 6, sv.shape)
            if r2.random() < 0.5:  # NaN holes incl. whole pings
                sv[r2.random(sv.shape) < 0.08] = np.nan
                if n_ping > 3:
                    sv[:, int(r2.integers(0, n_ping)), :] = np.nan
            ds["Sv"].values[...] = sv
            if r2.random() < 0.4:  # nonuniform range spacing
                er = np.asarray(ds["echo_range"].values).copy()
                er *= (1.0 + 0.1 * np.sin(np.arange(er.shape[-1])))
                ds["echo_range"].values[...] = er
            for fname in names:
                want = getattr(ref_m, fname)(ds)
                got = getattr(ep.metrics, fname)(ds)
                wv = np.asarray(getattr(want, "values", want), dtype="f8").squeeze()
                gv = np.asarray(getattr(got, "values", got), dtype="f8").squeeze()
                if not (np.array_equal(np.isnan(gv), np.isnan(wv))
                        and np.allclose(np.nan_to_num(gv), np.nan_to_num(wv),
                                        rtol=1e-10, atol=1e-12)):
                    fails += 1
                    print(f"FAIL metric {fname} cfg={cfg}", flush=True)

            # QC: random reversed-time pings -> exist + coerce parity
            if n_ping > 5:
                pt = np.asarray(ds.coords["ping_time"].values).copy()
                for _ in range(int(r2.integers(1, 4))):
                    j = int(r2.integers(1, n_ping))
                    pt[j] = pt[max(0, j - 2)] - np.timedelta64(
                        int(r2.integers(1, 9)), "s")
                ds.coords["ping_time"].values[...] = pt
                w_ex = bool(ref_qc.exist_reversed_time(ds, "ping_time"))
                g_ex = bool(ep.qc.exist_reversed_time(ds, "ping_time"))
                if w_ex != g_ex:
                    fails += 1
                    print(f"FAIL qc exist_reversed_time cfg={cfg}", flush=True)
                w2 = ds.copy(deep=True); g2 = ds.copy(deep=True)
                try:
                    ref_qc.coerce_increasing_time(w2, "ping_time")
                except IndexError:
                    # inverted finding: the reference's _clean_reversed
                    # (qc/api.py:23) crashes when a local window has no
                    # "first valid" element (reversals crossing window
                    # starts).  Ours must still repair to nondecreasing.
                    ep.qc.coerce_increasing_time(g2, "ping_time")
                    gt = np.asarray(g2.coords["ping_time"].values,
                                    "datetime64[ns]")
                    if np.any(np.diff(gt) < np.timedelta64(0, "ns")):
                        fails += 1
                        print(f"FAIL qc coerce (ref crashed; ours not "
                              f"monotone) cfg={cfg}", flush=True)
                    else:
                        print(f"INFO classified: reference coerce_"
                              f"increasing_time IndexError, ours monotone "
                              f"cfg={cfg}", flush=True)
                    continue
                ep.qc.coerce_increasing_time(g2, "ping_time")
                if not np.array_equal(
                        np.asarray(w2.coords["ping_time"].values, "datetime64[ns]"),
                        np.asarray(g2.coords["ping_time"].values, "datetime64[ns]")):
                    fails += 1
                    print(f"FAIL qc coerce_increasing_time cfg={cfg}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_ecs80(n, rng):
    """Randomized EK80 ECS files with wideband (BB) gain/beamwidth/angle
    TABLES through the reference's full ecs_ev2ep -> conform_channel_order
    -> _assimilate_ecs_cal_params -> _get_interp_da chain
    (reference: calibrate/ecs.py:72-112,360 -> cal_params.py:165-258)
    executing on the facade, vs our compute_Sv(ecs_file=) at the Sv level.
    Randomizes: table axis units-as-listed (Hz spanning the per-ping center
    frequency, Hz NOT spanning -> NaN gain both sides, kHz axis -> never
    spans), table length, which of the five freq-dep tables appear,
    narrowband fallbacks, fileset env params, LocalCal overrides, missing
    channel sections, and raw shapes (extra FM channel, f16 complex)."""
    import numpy as np
    import echopype_tpu as ep
    from synth_ek80 import write_ek80_raw
    from test_ref_pipeline import _fake
    from ref_oracle import load_ref

    ref_ek = load_ref("calibrate/calibrate_ek")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    H = "#" + "=" * 88 + "#"
    deco = "#" + " " * 88 + "#"

    def header(title):
        return ["", H, f"#{title.center(88)}#", H, ""]

    # (name, value-generator) for the four freq-dep companion tables; the
    # frequency axis itself is generated per channel below
    TABLES = [
        ("GainTableWideband", lambda r, k: [f"{v:.2f}" for v in r.uniform(23, 28, k)], "# (decibels)"),
        ("MajorAxisBeamWidthTableWideband", lambda r, k: [f"{v:.2f}" for v in r.uniform(5.5, 7.5, k)], "# (degrees)"),
        ("MinorAxisBeamWidthTableWideband", lambda r, k: [f"{v:.2f}" for v in r.uniform(5.5, 7.5, k)], "# (degrees)"),
        ("MajorAxisAngleOffsetTableWideband", lambda r, k: [f"{v:.3f}" for v in r.uniform(-0.4, 0.4, k)], "# (degrees)"),
        ("MinorAxisAngleOffsetTableWideband", lambda r, k: [f"{v:.3f}" for v in r.uniform(-0.4, 0.4, k)], "# (degrees)"),
    ]
    # per-channel BB band (Hz) of the synth writer's two FM channels
    BANDS = {1: (45_000.0, 90_000.0), 2: (160_000.0, 260_000.0)}

    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        extra = bool(r2.random() < 0.6)
        cfg = dict(seed=seed, extra_fm_channel=extra)
        try:
            lines = [
                H,
                "#" + "ECHOVIEW CALIBRATION SUPPLEMENT (.ECS) FILE "
                "(SimradEK80Raw)".center(88) + "#",
                "#" + "3/5/2023 14:02:59.1234".center(88) + "#",
                H,
            ] + [deco] * 6 + [H, "", "Version 1.00"]
            lines += header("FILESET SETTINGS")
            if r2.random() < 0.6:
                lines.append(f"SoundSpeed = {r2.uniform(1460, 1520):.1f} # (meters per second)")
            if r2.random() < 0.5:
                lines.append(f"Salinity = {r2.uniform(28, 36):.1f} # (PSU)")
            if r2.random() < 0.5:
                lines.append(f"Temperature = {r2.uniform(4, 18):.1f} # (degrees celsius)")
            if r2.random() < 0.4:
                lines.append(f"AbsorptionDepth = {r2.uniform(10, 120):.1f} # (meters)")
            lines += header("SOURCECAL SETTINGS")
            n_ch = 2 if extra else 1
            for t in range(1, n_ch + 1):
                if extra and t == 2 and r2.random() < 0.2:
                    continue  # missing channel section
                lines += ["", f"SourceCal T{t}"]
                # every real block carries a Frequency line (Echoview
                # templates keep it commented; BOTH parsers special-case the
                # commented form).  Without one anywhere the reference
                # crashes with KeyError('frequency_nominal') (ecs.py:355)
                # and we raise ValueError — pinned in tests/test_ecs.py.
                fq = {1: 70.00, 2: 200.00}[t]
                if r2.random() < 0.1:
                    fq = 333.0  # no overlap with the data -> block dropped
                pre = "# " if r2.random() < 0.4 else ""
                lines.append(f"    {pre}Frequency = {fq:.2f} # (kilohertz)")
                mode = r2.choice(["span", "nospan", "khz", "none"],
                                 p=[0.45, 0.15, 0.15, 0.25])
                cfg[f"t{t}"] = str(mode)
                if mode != "none":
                    lo, hi = BANDS[t]
                    k = int(r2.integers(3, 8))
                    if mode == "span":
                        # axis generously spans the band in Hz
                        ax = np.sort(r2.uniform(lo - 10_000, hi + 10_000, k))
                        ax[0], ax[-1] = lo - 5_000, hi + 5_000
                        unit = "# (hertz)"
                    elif mode == "nospan":
                        # Hz axis entirely below the band -> NaN gain both sides
                        ax = np.sort(r2.uniform(5_000, lo - 20_000, k))
                        unit = "# (hertz)"
                    else:  # kHz axis: units kept AS LISTED -> never spans
                        ax = np.sort(r2.uniform(lo / 1e3, hi / 1e3, k))
                        unit = "# (kilohertz)"
                    lines.append("    FrequencyTableWideband = "
                                 + " ".join(f"{v:.1f}" for v in ax) + f" {unit}")
                    # gain table always accompanies the axis; others random
                    for j, (name, gen, u) in enumerate(TABLES):
                        if j == 0 or r2.random() < 0.5:
                            lines.append(f"    {name} = " + " ".join(gen(r2, k)) + f" {u}")
                if r2.random() < 0.7:
                    lines.append(f"    TransducerGain = {r2.uniform(23, 28):.2f} # (decibels)")
                if r2.random() < 0.4:
                    lines.append(f"    MajorAxis3dbBeamAngle = {r2.uniform(6, 8):.2f} # (degrees)")
                if r2.random() < 0.3:
                    lines.append(f"    AbsorptionDepth = {r2.uniform(10, 120):.1f} # (meters)")
            lines += header("LOCALCAL SETTINGS")
            if r2.random() < 0.3:
                lines += ["", "LocalCal T1",
                          f"    TransducerGain = {r2.uniform(23, 28):.2f} # (decibels)"]
            ecs = tmp / f"e80_{i}.ecs"
            ecs.write_text("\n".join(lines) + "\n")

            raw = tmp / f"E8{i}-D20210201-T000000.raw"
            write_ek80_raw(
                raw,
                n_pings=int(r2.integers(3, 8)),
                n_samples=int(r2.integers(24, 80)),
                with_power_channel=False,
                with_cw_complex=False,
                extra_fm_channel=extra,
                complex_f16=bool(r2.random() < 0.25),
                seed=seed,
            )
            ed = ep.open_raw(str(raw), sonar_model="EK80")
            try:
                ref_cal = ref_ek.CalibrateEK80(
                    _fake(ed), env_params=None, cal_params=None,
                    ecs_file=str(ecs), waveform_mode="BB",
                    encode_mode="complex",
                )
                want = (ref_cal.compute_Sv()["Sv"]
                        .transpose("channel", "ping_time", "range_sample"))
                ref_err = None
            except Exception as e:  # noqa: BLE001
                want, ref_err = None, e
            try:
                got_ds = ep.calibrate.compute_Sv(
                    ed, ecs_file=str(ecs), waveform_mode="BB",
                    encode_mode="complex", precision="float64",
                )
                got, our_err = got_ds["Sv"], None
            except Exception as e:  # noqa: BLE001
                got, our_err = None, e
            both_refuse = (
                ref_err is not None
                and isinstance(our_err, ValueError)
                and ("should exist for all channels" in str(our_err)
                     or "coverage of every channel" in str(our_err))
                and isinstance(ref_err, (KeyError, AttributeError))
            )
            if both_refuse:
                # classified family: inputs the reference CRASHES on at one
                # of its raw sites (ds_cal_BB=None conform/ds2dict
                # AttributeError; param-fallback KeyError at
                # calibrate_ek.py:396 — which param it names first follows
                # its iteration order; channel-label .sel KeyError at
                # cal_params.py:234) where ours raises ONE descriptive
                # ValueError for the same condition (no narrowband fallback /
                # partial-coverage ECS in the EK80 complex chain)
                print(f"INFO classified: both refuse ({ref_err!r} vs "
                      f"{our_err!r}) cfg={cfg}", flush=True)
                continue
            if ref_err is not None and our_err is None:
                if isinstance(ref_err, AttributeError) and (
                    "data_vars" in str(ref_err) or "coords" in str(ref_err)
                ):
                    # inverted findings, both the ds_cal_BB-is-None class:
                    # (a) an ECS whose frequencies overlap NONE of the data
                    #     channels -> ecs_ds2dict(None) AttributeError
                    #     'data_vars' (calibrate_ek.py:350); pinned in
                    #     tests/test_ecs.py::test_zero_overlap_ecs_is_inert
                    # (b) a BB calibration with an ECS carrying NO wideband
                    #     tables at all -> conform_channel_order(None)
                    #     AttributeError 'coords' (calibrate_ek.py:353,
                    #     ecs.py:442); pinned in
                    #     tests/test_ecs.py::test_tableless_ecs_bb_applies_scalars
                    # ours applies whatever scalar params the ECS carries
                    print(f"INFO classified: reference ds_cal_BB=None crash "
                          f"({ref_err}) cfg={cfg}", flush=True)
                    continue
                fails += 1
                print(f"FAIL ecs80 error-parity ref={ref_err!r} ours=None "
                      f"cfg={cfg}", flush=True)
                continue
            if our_err is not None and ref_err is None:
                fails += 1
                print(f"FAIL ecs80 error-parity ref=None ours={our_err!r} "
                      f"cfg={cfg}", flush=True)
                continue
            if ref_err is not None:
                same_type = type(ref_err).__name__ == type(our_err).__name__
                # classified: the reference raises a bare KeyError where a
                # BB table param has no narrowband fallback — either
                # KeyError(param) (calibrate_ek.py:396 indexes ds_cal_NB
                # unconditionally) or KeyError(channel-label) when the
                # narrowband alternative exists but MISSES the BB channel
                # (cal_params.py:234 .sel(channel=...) — round-5 seed
                # 333168947); ours raises the descriptive ValueError for
                # the same condition ("should exist for all channels")
                key_vs_msg = (
                    isinstance(ref_err, KeyError)
                    and isinstance(our_err, ValueError)
                    and (
                        str(ref_err).strip("'\"") in str(our_err)
                        or ("channel" in str(ref_err)
                            and "should exist for all channels" in str(our_err))
                    )
                )
                if key_vs_msg and not same_type:
                    print(f"INFO classified: descriptive-error-vs-raw-KeyError "
                          f"({ref_err!r} vs {our_err!r}) cfg={cfg}", flush=True)
                if not (same_type or key_vs_msg):
                    fails += 1
                    print(f"FAIL ecs80 error-type ref={ref_err!r} "
                          f"ours={our_err!r} cfg={cfg}", flush=True)
                continue
            # interpolated gain parameter, exact on both sides
            rg = np.asarray(ref_cal.cal_params["gain_correction"].values, dtype="f8")
            og = np.asarray(got_ds["gain_correction"].values, dtype="f8")
            if og.shape != rg.shape or not (
                np.array_equal(np.isnan(og), np.isnan(rg))
                and np.allclose(np.nan_to_num(og), np.nan_to_num(rg), rtol=0, atol=1e-10)
            ):
                fails += 1
                print(f"FAIL ecs80 gain-param cfg={cfg}\n ref={rg}\n got={og}",
                      flush=True)
                continue
            w = np.asarray(want.values, dtype="f8")
            g = np.asarray(got.values, dtype="f8")
            if not np.array_equal(np.isnan(g), np.isnan(w)):
                fails += 1
                print(f"FAIL ecs80 NaN-mask cfg={cfg}", flush=True)
                continue
            m = ~np.isnan(w)
            d = np.abs(g[m] - w[m]).max() if m.any() else 0.0
            # budget: the reference's own complex64 pulse-compression
            # quantization floor (same as the plain BB differential)
            if d > 7.5e-5:
                fails += 1
                print(f"FAIL ecs80 max|d|={d:.3e} cfg={cfg}", flush=True)
            elif d > 5e-6:
                print(f"NOTE ecs80 d={d:.2e} within reference-c64 budget "
                      f"cfg={cfg}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_ecs(n, rng):
    """Randomized EK60 ECS files through the full precedence chain
    (fileset < sourcecal < localcal) vs the reference CalibrateEK60 on the
    facade: random param subsets per channel, LocalCal overrides, comment
    and whitespace noise, and missing-channel sections."""
    import numpy as np
    import echopype_tpu as ep
    from synth_ek60 import write_ek60_raw
    from test_ref_pipeline import _fake
    from ref_oracle import load_ref

    ref_ek = load_ref("calibrate/calibrate_ek")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    # EK60-scope EV names only (calibrate/ecs.py _PARAM_TABLE).  Alias
    # pairs (TransducerGain/Ek60TransducerGain, SaCorrectionFactor/
    # EK60SaCorrection) are picked ONE per block: with duplicates in one
    # file the reference's winner follows PYTHONHASHSEED (set iteration in
    # its ecs_ev2ep) — the comparison target is undefined.  Ours pins
    # last-in-file-wins (tests/test_ecs.py::
    # test_duplicate_alias_last_in_file_wins).
    PARAMS = [
        ("AbsorptionCoefficient", lambda r: f"{r.uniform(0.001, 0.02):.6f}",
         "# (decibels per meter)"),
        (("TransducerGain", "Ek60TransducerGain"),
         lambda r: f"{r.uniform(18, 28):.2f}", "# (decibels)"),
        (("SaCorrectionFactor", "EK60SaCorrection"),
         lambda r: f"{r.uniform(-1.0, 0.5):.2f}", "# (decibels)"),
        ("TwoWayBeamAngle", lambda r: f"{r.uniform(-22, -15):.2f}",
         "# (decibels re 1 steradian)"),
        ("TransmittedPower", lambda r: f"{r.uniform(500, 2000):.1f}",
         "# (watts)"),
        ("MajorAxis3dbBeamAngle", lambda r: f"{r.uniform(6, 12):.2f}", ""),
        ("MinorAxisAngleOffset", lambda r: f"{r.uniform(-0.3, 0.3):.3f}", ""),
    ]
    H = "#" + "=" * 88 + "#"

    def header(title):
        return ["", H, f"#{title.center(88)}#", H, ""]

    freqs = (18.0, 38.0)
    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        cfg = dict(seed=seed)
        try:
            # the reference REQUIRES the full canonical 11-line Echoview
            # banner: type header (data_type read from it), timestamp,
            # separator, EXACTLY six decorative lines, separator
            # (_parse_header hard-codes the layout; ours is lenient)
            deco = "#" + " " * 88 + "#"
            lines = [
                H,
                "#" + "ECHOVIEW CALIBRATION SUPPLEMENT (.ECS) FILE "
                "(SimradEK60Raw)".center(88) + "#",
                "#" + "12/20/2022 08:30:15.0000".center(88) + "#",
                H,
            ] + [deco] * 6 + [
                H,
                "",
                "Version 1.00",
            ]
            lines += header("FILESET SETTINGS")
            if r2.random() < 0.7:
                lines.append(f"SoundSpeed = {r2.uniform(1440, 1540):.1f} "
                             "# (meters per second)")
            lines += header("SOURCECAL SETTINGS")
            # alias choice is PER FILE: split aliases across channels (or
            # duplicates within one) make the reference's winner hash-order
            # dependent — parity there is undefined (see PARAMS note)
            params_resolved = [
                (str(r2.choice(name)) if isinstance(name, tuple) else name,
                 gen, unit)
                for name, gen, unit in PARAMS
            ]
            for t, f in enumerate(freqs, start=1):
                if r2.random() < 0.15 and t == 2:
                    continue  # missing channel section
                lines += ["", f"SourceCal T{t}"]
                lines.append(f"    Frequency = {f:.2f} # (kilohertz)")
                for name, gen, unit in params_resolved:
                    if r2.random() < 0.5:
                        pad = " " * int(r2.integers(1, 6))
                        lines.append(f"    {name}{pad}={pad}{gen(r2)} {unit}")
                if r2.random() < 0.3:
                    # commented-out assignment: the reference's block
                    # grammar accepts ONLY lines containing '=' (a bare
                    # comment raises "Unexpected line"; ours is lenient),
                    # and the skip group must ignore the value
                    lines.append("    # PulseDuration = 1.024 # ignored")
            lines += header("LOCALCAL SETTINGS")
            if r2.random() < 0.4:
                gain_name = params_resolved[1][0]  # the file's gain alias
                lines += ["", "LocalCal T1",
                          f"    {gain_name} = {r2.uniform(18, 28):.2f}"]
            ecs = tmp / f"c{i}.ecs"
            ecs.write_text("\n".join(lines) + "\n")
            raw = tmp / f"ECS{i}-D20200101-T000000.raw"
            write_ek60_raw(raw, n_pings=int(r2.integers(3, 10)),
                           n_samples=int(r2.integers(20, 70)), seed=seed)
            ed = ep.open_raw(str(raw), sonar_model="EK60")
            try:
                want = (ref_ek.CalibrateEK60(_fake(ed), None, None, str(ecs))
                        .compute_Sv()["Sv"]
                        .transpose("channel", "ping_time", "range_sample"))
                ref_err = None
            except Exception as e:  # noqa: BLE001
                want, ref_err = None, e
            try:
                got = ep.calibrate.compute_Sv(ed, ecs_file=str(ecs),
                                              precision="float64")["Sv"]
                our_err = None
            except Exception as e:  # noqa: BLE001
                got, our_err = None, e
            if (ref_err is None) != (our_err is None):
                fails += 1
                print(f"FAIL ecs error-parity ref={ref_err!r} ours={our_err!r} "
                      f"cfg={cfg}", flush=True)
                continue
            if ref_err is not None:
                if type(ref_err).__name__ != type(our_err).__name__:
                    fails += 1
                    print(f"FAIL ecs error-type ref={ref_err!r} "
                          f"ours={our_err!r} cfg={cfg}", flush=True)
                continue
            w = np.asarray(want.values, dtype="f8")
            g = np.asarray(got.values, dtype="f8")
            if not np.array_equal(np.isnan(g), np.isnan(w)):
                fails += 1
                print(f"FAIL ecs NaN-mask cfg={cfg}", flush=True)
                continue
            m = ~np.isnan(w)
            d = np.abs(g[m] - w[m]).max() if m.any() else 0.0
            if d > 1e-11:
                fails += 1
                print(f"FAIL ecs max|d|={d:.3e} cfg={cfg}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_store(n, rng):
    """Store-format interop on random trees, BOTH directions per config:
    the reference's own EchoData.to_zarr chain writes (facade bridge + its
    encodings) and our open_converted reads bit-exact; our to_zarr/to_netcdf
    writes and the reference's EchoData.from_file reads back identically.
    Random shapes/raggedness/dropouts/NMEA/instrument mix."""
    import numpy as np
    import echopype_tpu as ep
    from synth_ek60 import write_ek60_raw
    from synth_ek80 import write_ek80_raw
    from ref_oracle import (
        load_ref_convert_api, load_ref_echodata, make_ref_echodata,
    )
    from test_ref_store import _assert_ds_equal

    load_ref_convert_api()
    layer = load_ref_echodata()
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        model = str(r2.choice(["EK60", "EK80"]))
        cfg = dict(seed=seed, model=model)
        try:
            if model == "EK60":
                raw = tmp / f"S{i}-D20200101-T000000.raw"
                kw = {}
                if r2.random() < 0.3:
                    kw["ragged"] = True
                if r2.random() < 0.3:
                    kw["skip_pings"] = {1: {1, 3}}
                write_ek60_raw(raw, n_pings=int(r2.integers(3, 14)),
                               n_samples=int(r2.integers(15, 80)),
                               seed=seed, with_nmea=bool(r2.random() < 0.7),
                               **kw)
            else:
                raw = tmp / f"S{i}-D20210201-T000000.raw"
                write_ek80_raw(raw, n_pings=int(r2.integers(3, 10)),
                               n_samples=int(r2.integers(24, 80)), seed=seed,
                               with_power_channel=bool(r2.random() < 0.7),
                               with_cw_complex=bool(r2.random() < 0.5),
                               complex_f16=bool(r2.random() < 0.3),
                               with_raw4=bool(r2.random() < 0.35))
            ed = ep.open_raw(str(raw), sonar_model=model)

            # A: reference writes zarr through its own save chain; we read.
            # ~half the configs route the chain onto the Zarr V3 layout
            # (what the real echopype's zarr>=3 chain produces in the wild)
            ref_ed = make_ref_echodata(
                {g: ed[g] for g in ed.group_paths}, model, source_file=str(raw))
            store_a = str(tmp / f"ref{i}.zarr")
            v3 = bool(r2.random() < 0.5)
            cfg["v3"] = v3
            from echopype_tpu.xrlite import datatree as _dt

            old_fmt = _dt.DEFAULT_ZARR_FORMAT
            try:
                _dt.DEFAULT_ZARR_FORMAT = 3 if v3 else 2
                ref_ed.to_zarr(save_path=store_a, overwrite=True)
            finally:
                _dt.DEFAULT_ZARR_FORMAT = old_fmt
            if v3:
                assert (pathlib.Path(store_a) / "zarr.json").exists(), "not a v3 store"
            ours = ep.open_converted(store_a)
            # inverted finding: the reference's to_file saves ONLY
            # Beam_group1/Beam_group2 for non-AD2CP models
            # (convert/api.py:185-204), so an EK80 file with power +
            # CW-complex + BB channels — a 3-way split the reference's own
            # SetGroupsEK80 produces — silently LOSES Beam_group3 on save.
            # Ours saves every group (direction B pins the full round trip).
            expect = {g for g in ed.group_paths
                      if not (g.startswith("Sonar/Beam_group")
                              and int(g.rsplit("group", 1)[1]) > 2)}
            dropped = set(ed.group_paths) - expect
            if dropped:
                print(f"INFO classified: reference to_file drops "
                      f"{sorted(dropped)} cfg={cfg}", flush=True)
            if set(ours.group_paths) != expect:
                fails += 1
                print(f"FAIL store A group set {sorted(ours.group_paths)} "
                      f"vs {sorted(expect)} cfg={cfg}", flush=True)
            else:
                for g in sorted(expect):
                    try:
                        _assert_ds_equal(ed[g], ours[g], g)
                    except AssertionError as e:
                        fails += 1
                        print(f"FAIL store A group {g} cfg={cfg}: {e}",
                              flush=True)
                        break

            # B: we write (zarr v2/v3 [optionally sharded] or netcdf); the
            # reference reads
            rb = r2.random()
            if rb < 0.5:
                store_b = str(tmp / f"our{i}.zarr")
                kw_b = {}
                if rb < 0.125:
                    # sharded v3 (sharding_indexed) with random shard sizes
                    kw_b["shard_spec"] = {
                        "ping_time": int(r2.integers(2, 9)),
                        "range_sample": int(r2.integers(8, 40)),
                    }
                ed.to_zarr(store_b, zarr_format=3 if rb < 0.25 else 2, **kw_b)
            else:
                store_b = str(tmp / f"our{i}.nc")
                ed.to_netcdf(store_b)
            ref_read = layer["EchoData"].from_file(store_b)
            for g in ed.group_paths:
                ref_ds = ref_read[g]
                if ref_ds is None:
                    fails += 1
                    print(f"FAIL store B missing group {g} cfg={cfg}", flush=True)
                    break
                try:
                    _assert_ds_equal(ed[g], ref_ds, g)
                except AssertionError as e:
                    fails += 1
                    print(f"FAIL store B group {g} cfg={cfg}: {e}", flush=True)
                    break
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_ad2cp(n, rng):
    """Randomized AD2CP files through the reference's full conversion
    (ParseAd2cp -> SetGroupsAd2cp, full variable/coord-set compare per
    group) vs our open_raw: burst vs average ids, 3/4-beam layouts, cell
    counts, optional AHRS/percentage-good/altimeter(+raw)/AST/std-dev
    blocks, status bitfields, echosounder(+raw) presence and packet order,
    bottom track.  AST-bearing files classify the reference's own
    set_vendor crash (known inverted finding)."""
    import numpy as np
    from test_ad2cp import write_ad2cp
    from test_ref_setgroups import _cmp_full_group, _run_ref_ad2cp

    import echopype_tpu as ep

    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        record_kw = dict(
            num_beams=int(r2.choice([3, 4])),
            num_cells=int(r2.integers(5, 24)),
            include_corr=bool(r2.random() < 0.8),
            with_ahrs=bool(r2.random() < 0.3),
            with_percentage_good=bool(r2.random() < 0.3),
            with_altimeter=bool(r2.random() < 0.3),
            with_altimeter_raw=bool(r2.random() < 0.2),
            with_ast=bool(r2.random() < 0.2),
            with_std_dev=bool(r2.random() < 0.2),
            status=int(r2.integers(0, 1 << 31)),
            status0=int(r2.integers(0, 1 << 16)),
        )
        kw = dict(
            n_pings=int(r2.integers(2, 7)),
            average_id=int(r2.choice([0x15, 0x16])),
            with_echosounder=bool(r2.random() < 0.6),
            echosounder_first=bool(r2.random() < 0.3),
            # the synthetic BT record carries a fixed 4-beam description;
            # the per-file beam coord is the longest beams list across
            # packets, so BT next to 3-beam data would make the file
            # self-inconsistent (both implementations reject it)
            with_bottom_track=bool(r2.random() < 0.3
                                   and record_kw["num_beams"] == 4),
            with_echosounder_raw=bool(r2.random() < 0.2),
            record_kw=record_kw,
        )
        cfg = dict(seed=seed, **{k: v for k, v in kw.items() if k != "record_kw"},
                   **record_kw)
        try:
            raw = tmp / f"A{i}.ad2cp"
            write_ad2cp(str(raw), **kw)
            sg = _run_ref_ad2cp(raw)
            ref_beams = sg.set_beam()
            ed = ep.open_raw(str(raw), sonar_model="AD2CP")
            for bi, ref_b in enumerate(ref_beams):
                _cmp_full_group(ref_b, ed[f"Sonar/Beam_group{bi + 1}"],
                                f"beam{bi}")
            _cmp_full_group(sg.set_env(), ed["Environment"], "env")
            _cmp_full_group(sg.set_platform(), ed["Platform"], "platform")
            if record_kw["with_ast"]:
                # the reference's set_vendor cannot represent the 8-byte
                # altimeter_spare on one time1 dim and crashes; ours emits
                # ("time1", "spare") — documented deviation
                try:
                    sg.set_vendor()
                    print(f"INFO reference set_vendor no longer crashes on "
                          f"AST cfg={cfg}", flush=True)
                except Exception:
                    pass
                assert ed["Vendor_specific"]["altimeter_spare"].dims == (
                    "time1", "spare")
            else:
                _cmp_full_group(sg.set_vendor(), ed["Vendor_specific"],
                                "vendor", skip_vars=("altimeter_spare",))
        except AssertionError as e:
            fails += 1
            print(f"FAIL ad2cp {e} cfg={cfg}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_azfp6(n, rng):
    """Randomized AZFP6 (ULS6 .azfp) files through the reference's
    ParseAZFP6 + SetGroupsAZFP6 (beam + Environment; set_vendor is not
    executable on synthetic files — the reference's own _check_uniqueness
    leaves profile_flag an empty list its xr.Dataset build rejects) and
    through the reference CalibrateAZFP Sv chain, vs our full conversion +
    compute_Sv.  Fuzz axes: ping count, bin count, raw vs averaged
    (data_type=1 u32+overflow) payloads, start minute, env params."""
    import numpy as np
    import echopype_tpu as ep
    from test_azfp6 import write_azfp6_raw
    from ref_oracle import FakeEchoData, load_ref

    ref_parse_mod = load_ref("convert/parse_azfp6")
    ref_sg_mod = load_ref("convert/set_groups_azfp6")
    ref_cal_mod = load_ref("calibrate/calibrate_azfp")
    convert_params = {
        "survey_name": "", "platform_name": "", "platform_type": "",
        "platform_code_ICES": "", "water_level": np.nan,
        "nmea_gps_sentence": "GGA",
    }
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        cfg = dict(
            n_pings=int(rng.integers(2, 20)),
            num_bins=int(rng.integers(5, 80)),
            averaged=bool(rng.random() < 0.4),
            minute=int(rng.integers(0, 50)),
            seed=int(rng.integers(0, 10**6)),
        )
        env = {
            "salinity": float(rng.uniform(25, 36)),
            "pressure": float(rng.uniform(5, 100)),
            "temperature": float(rng.uniform(2, 20)),
        }
        raw = tmp / f"2207{i:02d}00.azfp"
        try:
            write_azfp6_raw(str(raw), **cfg)
            parser = ref_parse_mod.ParseAZFP6(
                str(raw), file_meta=None, storage_options={}, sonar_model="AZFP6"
            )
            parser.parse_raw()
            sg = ref_sg_mod.SetGroupsAZFP6(
                parser, input_file=str(raw), xml_path=None, output_path=None,
                sonar_model="AZFP6", params=dict(convert_params),
            )
            ref_beam = sg.set_beam()[0]
            ref_env = sg.set_env()
            ed = ep.open_raw(str(raw), sonar_model="AZFP6")
            our_beam = ed["Sonar/Beam_group1"]
            for var in ("backscatter_r", "frequency_nominal"):
                w_da = ref_beam[var]
                if tuple(w_da.dims) != tuple(our_beam[var].dims):
                    w_da = w_da.transpose(*our_beam[var].dims)
                w = np.asarray(w_da.values, dtype="f8")
                g = np.asarray(our_beam[var].values, dtype="f8")
                assert g.shape == w.shape, f"{var} shape {g.shape} != {w.shape}"
                np.testing.assert_allclose(g, w, rtol=1e-12, err_msg=var)
            np.testing.assert_array_equal(
                np.asarray(our_beam.coords["ping_time"].values, dtype="datetime64[ns]"),
                np.asarray(ref_beam.coords["ping_time"].values, dtype="datetime64[ns]"),
            )
            for var in ("temperature", "pressure"):
                if var in ref_env.data_vars and var in ed["Environment"].data_vars:
                    np.testing.assert_allclose(
                        np.asarray(ed["Environment"][var].values, dtype="f8"),
                        np.asarray(ref_env[var].values, dtype="f8"),
                        rtol=1e-9, err_msg=var, equal_nan=True,
                    )
            # calibration leg: reference CalibrateAZFP on the facade
            fake = FakeEchoData(
                {p: ed[p] for p in ("Sonar/Beam_group1", "Environment",
                                    "Vendor_specific")},
                ed.sonar_model,
            )
            want = ref_cal_mod.CalibrateAZFP(fake, env_params=dict(env)).compute_Sv()
            got = ep.calibrate.compute_Sv(ed, env_params=dict(env))
            w_da = want["Sv"]
            if tuple(w_da.dims) != tuple(got["Sv"].dims):
                w_da = w_da.transpose(*got["Sv"].dims)
            w = np.asarray(w_da.values, dtype="f8")
            g = np.asarray(got["Sv"].values, dtype="f8")
            nm = int((np.isnan(g) != np.isnan(w)).sum())
            m = ~np.isnan(w)
            d = float(np.max(np.abs(g[m] - w[m]))) if m.any() else 0.0
            if nm or d > 1e-9:
                raise AssertionError(f"Sv delta={d} nan_mismatch={nm}")
        except AssertionError as e:
            fails += 1
            print(f"FAIL azfp6 cfg={cfg}: {e}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def _sidecar_ref_subset_of_ours(ref_platform, our_platform, ref_vendor, our_vendor):
    """True iff every sidecar row the reference recovered exists in ours with
    identical values (time-aligned), i.e. ours is a superset recovery."""
    import numpy as np

    def _rows_subset(ref_ds, our_ds, tdim, variables):
        if tdim not in ref_ds.coords:
            return True
        if tdim not in our_ds.coords:
            return False
        rt = np.asarray(ref_ds.coords[tdim].values, dtype="datetime64[ns]")
        ot = np.asarray(our_ds.coords[tdim].values, dtype="datetime64[ns]")
        pos = {t: i for i, t in enumerate(ot)}
        try:
            sel = np.asarray([pos[t] for t in rt], dtype="i8")
        except KeyError:
            return False
        for var in variables:
            if var not in ref_ds.data_vars:
                continue
            if var not in our_ds.data_vars:
                return False
            rv = np.asarray(ref_ds[var].values, dtype="f8")
            axis = list(ref_ds[var].dims).index(tdim)
            ov = np.take(np.asarray(our_ds[var].values, dtype="f8"), sel, axis=axis)
            if not ((rv == ov) | (np.isnan(rv) & np.isnan(ov))).all():
                return False
        return True

    idx_vars = ("ping_number_idx", "file_offset_idx", "vessel_distance_idx",
                "latitude_idx", "longitude_idx")
    if not _rows_subset(ref_platform, our_platform, "time4", idx_vars):
        return False
    if "detected_seafloor_depth" in ref_vendor.data_vars:
        tdims = [d for d in ref_vendor["detected_seafloor_depth"].dims
                 if str(d).startswith("time") or str(d) == "ping_time"]
        if not tdims or not _rows_subset(ref_vendor, our_vendor, tdims[0],
                                         ("detected_seafloor_depth",)):
            return False
    return True


def soak_sidecars(n, rng):
    """Randomized EK60 .idx/.bot sidecar ingestion vs the reference's
    ParseEK60(bot_file=, idx_file=) -> SetGroupsEK60 chain
    (set_groups_base.py:371-522): random ping/sidecar-entry counts (incl.
    mismatched), random values, and a corrupt-byte leg where a random byte
    of one sidecar is flipped (framing resync must recover identically on
    both implementations; a reference-side crash with a clean conversion on
    ours classifies as an inverted finding, not a failure)."""
    import numpy as np
    import echopype_tpu as ep
    from synth_ek60 import dt64_to_nt, frame, make_con0, write_ek60_raw
    from test_sidecars import make_bot0, make_idx0
    from ref_oracle import load_ref

    ref_parse_mod = load_ref("convert/parse_ek60")
    ref_sg_mod = load_ref("convert/set_groups_ek60")
    convert_params = {
        "survey_name": "", "platform_name": "", "platform_type": "",
        "platform_code_ICES": "", "water_level": np.nan,
        "nmea_gps_sentence": "GGA",
    }
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for i in range(n):
        seed = int(rng.integers(0, 10**6))
        r2 = np.random.default_rng(seed)
        n_pings = int(r2.integers(2, 14))
        n_side = int(np.clip(n_pings + r2.integers(-2, 3), 1, None))
        n_chan = 2
        corrupt = bool(r2.random() < 0.35)
        cfg = dict(seed=seed, n_pings=n_pings, n_side=n_side, corrupt=corrupt)
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        raw = tmp / f"SC{i}-D20200101-T000000.raw"
        try:
            write_ek60_raw(raw, n_pings=n_pings, n_samples=int(r2.integers(8, 40)),
                           t0=t0, seed=seed)
            con = make_con0(t0, [{"channel_id": f"CH{k}", "frequency": 38000.0}
                                 for k in range(n_chan)])
            depths = r2.uniform(10, 900, (n_side, n_chan))
            bot = con + b"".join(
                make_bot0(t0 + np.timedelta64(p + 1, "s"), depths[p])
                for p in range(n_side)
            )
            idx = con + b"".join(
                make_idx0(
                    t0 + np.timedelta64(p + 1, "s"), p + 1,
                    float(r2.uniform(0, 5)), float(r2.uniform(-80, 80)),
                    float(r2.uniform(-179, 179)), int(r2.integers(0, 1 << 20)),
                )
                for p in range(n_side)
            )
            if corrupt:
                which = "bot" if r2.random() < 0.5 else "idx"
                blob = bytearray(bot if which == "bot" else idx)
                # flip one byte past the CON0 so the config still parses
                j = int(r2.integers(len(con), len(blob)))
                blob[j] ^= 0xFF
                if which == "bot":
                    bot = bytes(blob)
                else:
                    idx = bytes(blob)
            raw.with_suffix(".bot").write_bytes(bot)
            raw.with_suffix(".idx").write_bytes(idx)

            ref_err = None
            try:
                parser = ref_parse_mod.ParseEK60(
                    str(raw), bot_file=str(raw.with_suffix(".bot")),
                    idx_file=str(raw.with_suffix(".idx")),
                    storage_options={}, sonar_model="EK60",
                )
                parser.parse_raw()
                parser.rectangularize_data(use_swap=False)
                sg = ref_sg_mod.SetGroupsEK60(
                    parser, input_file=str(raw), xml_path=None, output_path=None,
                    sonar_model="EK60", params=dict(convert_params),
                )
                ref_platform = sg.set_platform()
                ref_vendor = sg.set_vendor()
            except Exception as e:  # noqa: BLE001
                ref_err = e
            ed = ep.open_raw(str(raw), sonar_model="EK60",
                             include_bot=True, include_idx=True)
            if ref_err is not None:
                print(f"INFO sidecars inverted finding cfg={cfg}: reference "
                      f"raised {type(ref_err).__name__}: {ref_err}; ours "
                      f"converted", flush=True)
                continue
            our_platform = ed["Platform"]
            our_vendor = ed["Vendor_specific"]
            try:
                for var in ("ping_number_idx", "file_offset_idx",
                            "vessel_distance_idx", "latitude_idx", "longitude_idx"):
                    if var not in ref_platform.data_vars:
                        assert var not in our_platform.data_vars, var
                        continue
                    np.testing.assert_allclose(
                        np.asarray(our_platform[var].values, dtype="f8"),
                        np.asarray(ref_platform[var].values, dtype="f8"),
                        rtol=0, atol=0, err_msg=var, equal_nan=True,
                    )
                if "time4" in ref_platform.coords:
                    np.testing.assert_array_equal(
                        np.asarray(our_platform.coords["time4"].values,
                                   dtype="datetime64[ns]"),
                        np.asarray(ref_platform.coords["time4"].values,
                                   dtype="datetime64[ns]"),
                    )
                if "detected_seafloor_depth" in ref_vendor.data_vars:
                    rv = ref_vendor["detected_seafloor_depth"]
                    gv = our_vendor["detected_seafloor_depth"]
                    assert tuple(gv.dims) == tuple(rv.dims)
                    np.testing.assert_allclose(
                        np.asarray(gv.values, dtype="f8"),
                        np.asarray(rv.values, dtype="f8"), equal_nan=True,
                    )
            except AssertionError:
                # A corrupt size field that claims bytes past EOF makes the
                # reference consume the rest of the file and drop every
                # later datagram (ek_raw_io.py:307-314 scans from EOF); our
                # scanner resyncs within the remaining bytes and recovers
                # them — a pinned deliberate divergence
                # (tests/test_fault_injection.py::test_corrupt_huge_size_prefix).
                # Classify: reference's recovery is a strict subset of ours
                # with agreeing overlap -> inverted finding, not a failure.
                if corrupt and _sidecar_ref_subset_of_ours(
                        ref_platform, our_platform, ref_vendor, our_vendor):
                    print(f"INFO sidecars inverted finding cfg={cfg}: "
                          f"reference dropped the post-corruption tail; ours "
                          f"recovered a superset (overlap identical)",
                          flush=True)
                else:
                    raise
        except AssertionError as e:
            fails += 1
            print(f"FAIL sidecars cfg={cfg}: {e}", flush=True)
        except Exception as e:
            fails += 1
            print(f"ERROR cfg={cfg}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return fails


def soak_platform(n, rng):
    """Randomized EchoData.update_platform differential: random external
    datasets (var subsets incl. the lat/lon pairing rule, time ranges offset
    before/within/after the converted range, NaN holes) through the
    reference's update_platform (echodata.py:349-517) vs ours on identical
    converted trees, with refusal parity on invalid var subsets."""
    import numpy as np
    import tempfile
    import echopype_tpu as ep  # noqa: F401 (facade registration)
    from test_ref_echodata import load_ref_echodata, _convert, _ref_eds

    load_ref_echodata()
    import xarray as xr  # the facade shim

    EXTRA = [("pitch", "P"), ("roll", "R"), ("vertical_offset", "H"),
             ("water_level", "WL")]
    fails = 0
    for i in range(n):
        tmp = pathlib.Path(tempfile.mkdtemp())
        paths, ours, theirs = _convert(tmp, n_files=1)
        n_t = int(rng.integers(3, 25))
        t0 = np.datetime64("2020-01-01T00:00:00", "ns") + np.timedelta64(
            int(rng.integers(-300, 300)), "s")
        t = t0 + np.cumsum(rng.integers(1, 9, n_t)).astype(
            "timedelta64[s]").astype("timedelta64[ns]")
        chosen = []
        r = rng.random()
        if r < 0.7:
            chosen += [("latitude", "lat"), ("longitude", "lon")]
        elif r < 0.8:
            chosen += [("latitude", "lat")]  # invalid: both must refuse
        k = int(rng.integers(0, len(EXTRA) + 1))
        chosen += [EXTRA[j] for j in rng.choice(len(EXTRA), size=k, replace=False)]
        if not chosen:
            chosen = [("pitch", "P")]
        data = {}
        for dst, src in chosen:
            v = rng.normal(0, 1, n_t)
            v[rng.random(n_t) < 0.15] = np.nan
            data[src] = (("time",), v)
        ext = xr.Dataset(data, coords={"time": t})
        mappings = {dst: src for dst, src in chosen}
        cfg = dict(i=i, n_t=n_t, vars=[d for d, _ in chosen])
        ref_err = our_err = None
        ref_ed = _ref_eds(theirs, paths)[0]
        try:
            ref_ed.update_platform(ext, variable_mappings=mappings)
        except Exception as e:
            ref_err = type(e).__name__
        try:
            ours[0].update_platform(ext, variable_mappings=mappings)
        except Exception as e:
            our_err = type(e).__name__
        if (ref_err is None) != (our_err is None):
            fails += 1
            print(f"FAIL err-parity cfg={cfg}: ref={ref_err} ours={our_err}",
                  flush=True)
            continue
        if ref_err is not None:
            continue
        try:
            rp, op = ref_ed["Platform"], ours[0]["Platform"]
            assert set(rp.data_vars) == set(op.data_vars), \
                (set(rp.data_vars) ^ set(op.data_vars))
            for name in mappings:
                r_, o_ = rp[name], op[name]
                assert tuple(r_.dims) == tuple(o_.dims), (name, r_.dims, o_.dims)
                rv = np.asarray(r_.values, dtype="f8")
                ov = np.asarray(o_.values, dtype="f8")
                same = (rv == ov) | (np.isnan(rv) & np.isnan(ov))
                assert same.all(), name
            assert set(rp.dims) == set(op.dims), (set(rp.dims) ^ set(op.dims))
            for d in rp.dims:
                if str(d).startswith("time"):
                    np.testing.assert_array_equal(
                        np.asarray(op.coords[d].values),
                        np.asarray(rp.coords[d].values), err_msg=d)
        except Exception as e:
            fails += 1
            print(f"FAIL cfg={cfg}: {type(e).__name__}: {e}", flush=True)
    return fails


def soak_ek60sg(n, rng):
    """Randomized reference ParseEK60 + SetGroupsEK60 full conversion
    differential (L1+L2): jittered CON0 installation fields (beam widths,
    angle offsets/sensitivities, mounts, pulse/gain/sa tables), jittered
    per-datagram RAW0 environment/motion fields, random GGA/GLL/RMC NMEA
    mixes, raggedness, per-channel sample counts, skipped pings, angle
    on/off.  Every group the reference emits is compared value-for-value."""
    import numpy as np
    import echopype_tpu as ep
    from synth_ek60 import write_ek60_raw
    from ref_oracle import load_ref

    ref_parse_mod = load_ref("convert/parse_ek60")
    ref_sg_mod = load_ref("convert/set_groups_ek60")
    params = {
        "survey_name": "", "platform_name": "", "platform_type": "",
        "platform_code_ICES": "", "water_level": np.nan,
        "nmea_gps_sentence": "GGA",
    }
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0

    GROUP_VARS = {
        "beam": (
            "backscatter_r", "angle_athwartship", "angle_alongship",
            "frequency_nominal", "transmit_duration_nominal",
            "sample_interval", "transmit_power",
            "beamwidth_twoway_alongship", "beamwidth_twoway_athwartship",
            "angle_offset_alongship", "angle_offset_athwartship",
            "angle_sensitivity_alongship", "angle_sensitivity_athwartship",
            "equivalent_beam_angle", "gain_correction",
            "transducer_offset_x", "transducer_offset_y",
            "transducer_offset_z", "data_type", "transmit_frequency_start",
            "transmit_frequency_stop",
        ),
        "env": ("absorption_indicative", "sound_speed_indicative",
                "temperature"),
        "platform": ("latitude", "longitude", "pitch", "roll",
                     "vertical_offset", "water_level"),
        "vendor": ("sa_correction", "gain_correction", "pulse_length"),
    }

    def _cmp_var(ref_ds, our_ds, var, tag, cfg, rtol):
        nonlocal fails
        has_ref = var in ref_ds.data_vars
        has_our = var in our_ds.data_vars
        if has_ref != has_our:
            fails += 1
            print(f"FAIL {tag} presence {var} ref={has_ref} cfg={cfg}",
                  flush=True)
            return
        if not has_ref:
            return
        w = np.asarray(ref_ds[var].values)
        g = np.asarray(our_ds[var].values)
        if w.shape != g.shape:
            fails += 1
            print(f"FAIL {tag} {var} shape {g.shape} vs {w.shape} cfg={cfg}",
                  flush=True)
            return
        str_w = w.dtype.kind in ("U", "S", "O")
        str_g = g.dtype.kind in ("U", "S", "O")
        if str_w != str_g:
            fails += 1
            print(f"FAIL {tag} {var} dtype kind {g.dtype} vs {w.dtype} "
                  f"cfg={cfg}", flush=True)
            return
        if str_w:
            if not np.array_equal(w.astype(str), g.astype(str)):
                fails += 1
                print(f"FAIL {tag} {var} strings cfg={cfg}", flush=True)
            return
        w = w.astype("f8")
        g = np.asarray(g, dtype="f8")
        with np.errstate(invalid="ignore"):
            bad = ~(np.isclose(g, w, rtol=rtol, atol=0.0)
                    | (np.isnan(g) & np.isnan(w)))
        if bad.any():
            fails += 1
            print(f"FAIL {tag} {var} {bad.sum()} cells cfg={cfg}", flush=True)

    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        n_pings = int(r2.integers(2, 14))
        fkw = dict(
            n_pings=n_pings,
            n_samples=int(r2.integers(12, 80)),
            seed=seed,
            with_angle=bool(r2.random() < 0.7),
            with_nmea=bool(r2.random() < 0.8),
            jitter_config=bool(r2.random() < 0.6),
            jitter_raw0=bool(r2.random() < 0.6),
            ragged=bool(r2.random() < 0.25),
        )
        if r2.random() < 0.5:
            k = int(r2.integers(1, 4))
            fkw["nmea_types"] = [str(t) for t in r2.choice(
                ["GGA", "GLL", "RMC"], size=k, replace=False)]
        if r2.random() < 0.3 and n_pings > 2:
            ch = int(r2.integers(1, 3))
            k = int(r2.integers(1, max(2, n_pings // 2)))
            fkw["skip_pings"] = {ch: set(
                int(x) for x in r2.choice(range(1, n_pings), size=k,
                                          replace=False))}
        elif r2.random() < 0.3:
            fkw["per_channel_samples"] = (
                fkw["n_samples"], max(4, int(r2.integers(4, fkw["n_samples"] + 1))))
        cfg = dict(**{k: v for k, v in fkw.items() if k != "skip_pings"},
                   skips=sum(len(v) for v in fkw.get("skip_pings", {}).values()))
        try:
            raw = tmp / f"SG60_{i}-D20200101-T000000.raw"
            write_ek60_raw(raw, **fkw)
            parser = ref_parse_mod.ParseEK60(
                str(raw), storage_options={}, sonar_model="EK60")
            parser.parse_raw()
            parser.rectangularize_data(use_swap=False)
            sg = ref_sg_mod.SetGroupsEK60(
                parser, input_file=str(raw), xml_path=None, output_path=None,
                sonar_model="EK60", params=dict(params),
            )
            ed = ep.open_raw(str(raw), sonar_model="EK60")
            fails_before = fails

            ref_b = sg.set_beam()[0]
            our_b = ed["Sonar/Beam_group1"]
            for var in GROUP_VARS["beam"]:
                _cmp_var(ref_b, our_b, var, "beam", cfg, rtol=3e-7)
            for c in ("ping_time", "channel"):
                rv = np.asarray(ref_b.coords[c].values)
                ov = np.asarray(our_b.coords[c].values)
                if not np.array_equal(rv.astype(str) if rv.dtype.kind in
                                      ("U", "O") else rv, ov.astype(str)
                                      if ov.dtype.kind in ("U", "O") else ov):
                    fails += 1
                    print(f"FAIL beam coord {c} cfg={cfg}", flush=True)

            ref_env = sg.set_env()
            our_env = ed["Environment"]
            for var in GROUP_VARS["env"]:
                _cmp_var(ref_env, our_env, var, "env", cfg, rtol=1e-12)

            ref_plat = sg.set_platform()
            our_plat = ed["Platform"]
            for var in GROUP_VARS["platform"]:
                _cmp_var(ref_plat, our_plat, var, "platform", cfg, rtol=1e-9)
            if "sentence_type" in ref_plat.data_vars:
                _cmp_var(ref_plat, our_plat, "sentence_type", "platform",
                         cfg, rtol=0.0)
            for tc in ("time1", "time2", "time3"):
                rt = (np.asarray(ref_plat.coords[tc].values,
                                 dtype="datetime64[ns]")
                      if tc in ref_plat.coords else None)
                ot = (np.asarray(our_plat.coords[tc].values,
                                 dtype="datetime64[ns]")
                      if tc in our_plat.coords else None)
                if (rt is None) != (ot is None):
                    fails += 1
                    print(f"FAIL platform coord {tc} presence cfg={cfg}",
                          flush=True)
                elif rt is not None and not np.array_equal(rt, ot):
                    fails += 1
                    print(f"FAIL platform coord {tc} values cfg={cfg}",
                          flush=True)

            if fkw["with_nmea"]:
                ref_n = sg.set_nmea()
                our_n = ed["Platform/NMEA"]
                if not np.array_equal(
                        np.asarray(ref_n["NMEA_datagram"].values).astype(str),
                        np.asarray(our_n["NMEA_datagram"].values).astype(str)):
                    fails += 1
                    print(f"FAIL NMEA_datagram cfg={cfg}", flush=True)

            ref_v = sg.set_vendor()
            our_v = ed["Vendor_specific"]
            for var in GROUP_VARS["vendor"]:
                _cmp_var(ref_v, our_v, var, "vendor", cfg, rtol=1e-12)

            if fails == fails_before:
                print(f"ok {i} cfg={cfg}", flush=True)
        except Exception:
            fails += 1
            print(f"ERROR cfg={cfg}", flush=True)
            traceback.print_exc()
    return fails


def soak_ek80sg(n, rng):
    """Randomized reference ParseEK80 + SetGroupsEK80 full conversion
    differential (L1+L2 group assembly): random channel mixes, RAW4, f16
    complex payloads, skipped pings, and DUPLICATED RAW3 datagrams in
    CW-complex/power channels (the reference dedups those via
    check_unique_ping_time_duplicates + drop_duplicates, set_groups_ek80.py:
    1155-1162, running here ON the facade).  FM-channel duplicates crash the
    reference in _add_freq_start_stop_ds (undeduped freq arrays vs deduped
    ping_time coord) — classified inverted finding; that leg instead checks
    OUR conversion reproduces the duplicate-free conversion exactly."""
    import numpy as np
    import echopype_tpu as ep
    from synth_ek80 import write_ek80_raw, CH_BB, CH_CW, CH_PW
    from ref_oracle import load_ref

    ref_parse_mod = load_ref("convert/parse_ek80")
    ref_sg_mod = load_ref("convert/set_groups_ek80")
    params = {
        "survey_name": "", "platform_name": "", "platform_type": "",
        "platform_code_ICES": "", "water_level": np.nan,
        "nmea_gps_sentence": "GGA",
    }
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0

    BEAM_VARS = (
        "backscatter_r", "backscatter_i", "frequency_nominal",
        "transmit_duration_nominal", "sample_interval",
        "angle_alongship", "angle_athwartship",
        "transmit_frequency_start", "transmit_frequency_stop",
        "transmit_power", "beamwidth_twoway_alongship",
        "beamwidth_twoway_athwartship", "angle_offset_alongship",
        "angle_offset_athwartship", "angle_sensitivity_alongship",
        "angle_sensitivity_athwartship", "equivalent_beam_angle",
    )

    def _vals(ds, var):
        da = ds[var]
        # squeeze singleton dims one side lacks (reference drops the channel
        # dim on per-channel subsets)
        return np.asarray(da.values, dtype="f8").squeeze()

    def _cmp_groups(ref_b, our_b, tag, cfg):
        nonlocal fails
        rt = np.asarray(ref_b.coords["ping_time"].values,
                        dtype="datetime64[ns]")
        ot = np.asarray(our_b.coords["ping_time"].values,
                        dtype="datetime64[ns]")
        if not np.array_equal(rt, ot):
            fails += 1
            print(f"FAIL {tag} ping_time cfg={cfg}", flush=True)
            return
        for var in BEAM_VARS:
            has_ref = var in ref_b.data_vars
            has_our = var in our_b.data_vars
            if has_ref != has_our:
                fails += 1
                print(f"FAIL {tag} presence {var} ref={has_ref} cfg={cfg}",
                      flush=True)
                return
            if not has_ref:
                continue
            w, g = _vals(ref_b, var), _vals(our_b, var)
            if w.shape != g.shape:
                fails += 1
                print(f"FAIL {tag} {var} shape {g.shape} vs {w.shape} "
                      f"cfg={cfg}", flush=True)
                return
            with np.errstate(invalid="ignore"):
                bad = ~(np.isclose(g, w, rtol=3e-7, atol=0.0)
                        | (np.isnan(g) & np.isnan(w)))
            if bad.any():
                fails += 1
                print(f"FAIL {tag} {var} {bad.sum()} cells cfg={cfg}",
                      flush=True)
                return

    for i in range(n):
        seed = int(rng.integers(0, 1 << 30))
        r2 = np.random.default_rng(seed)
        n_pings = int(r2.integers(3, 10))
        fkw = dict(
            n_pings=n_pings,
            n_samples=int(r2.integers(16, 80)),
            seed=seed,
            with_power_channel=bool(r2.random() < 0.6),
            with_cw_complex=bool(r2.random() < 0.6),
            complex_f16=bool(r2.random() < 0.25),
            extra_fm_channel=bool(r2.random() < 0.3),
            with_raw4=bool(r2.random() < 0.3),
            with_mru=str(r2.choice(["mru0", "mru1", "both", "none"],
                                   p=[0.25, 0.25, 0.25, 0.25])),
            jitter_config=bool(r2.random() < 0.5),
        )
        if fkw["with_mru"] == "none":
            fkw["with_mru"] = None
        if r2.random() < 0.5:
            # random GGA/GLL/RMC mix (the reference accepts all three,
            # NMEA_SENTENCE_DEFAULT, set_groups_base.py:13)
            k = int(r2.integers(1, 4))
            fkw["nmea_types"] = [str(t) for t in r2.choice(
                ["GGA", "GLL", "RMC"], size=k, replace=False)]
        if r2.random() < 0.5:
            fkw["env_fields"] = dict(
                depth=round(float(r2.uniform(5, 500)), 1),
                acidity=round(float(r2.uniform(7.5, 8.5)), 2),
                salinity=round(float(r2.uniform(5, 38)), 1),
                sound_speed=round(float(r2.uniform(1440, 1540)), 1),
                temperature=round(float(r2.uniform(-1, 25)), 1),
            )
        if r2.random() < 0.3 and n_pings > 2:
            k = int(r2.integers(1, max(2, n_pings // 2)))
            fkw["skip_pings"] = {CH_BB: set(
                int(x) for x in r2.choice(range(1, n_pings), size=k,
                                          replace=False))}
        # duplicates in the channels whose dedup path the reference survives
        dup = {}
        if r2.random() < 0.6:
            if fkw["with_cw_complex"] and r2.random() < 0.7:
                dup[CH_CW] = set(int(x) for x in r2.choice(
                    n_pings, size=int(r2.integers(1, max(2, n_pings // 2))),
                    replace=False))
            if fkw["with_power_channel"] and r2.random() < 0.7:
                dup[CH_PW] = set(int(x) for x in r2.choice(
                    n_pings, size=int(r2.integers(1, max(2, n_pings // 2))),
                    replace=False))
        if dup:
            fkw["duplicate_pings"] = dup
        fm_dup_leg = bool(r2.random() < 0.3)
        cfg = dict(dups={k.split()[-1]: sorted(v) for k, v in dup.items()},
                   fm_dup=fm_dup_leg,
                   **{k: v for k, v in fkw.items()
                      if k not in ("skip_pings", "duplicate_pings")})
        try:
            raw = tmp / f"SG{i}-D20210201-T000000.raw"
            write_ek80_raw(raw, **fkw)
            if fkw["complex_f16"]:
                # INVERTED FINDING (classified): the reference's RAW3
                # float16-complex branch is broken — type_bytes=2 reads HALF
                # the payload and bit-reinterprets f16 pairs as complex64
                # (ek_raw_parsers.py:1746-1765), yielding garbage shapes/
                # values, and CRASHES outright (reshape ValueError) whenever
                # count*n_complex % 4 != 0.  Skip the reference leg; instead
                # self-differential our f16 read against the same samples
                # written f32 (f16 round-trip tolerance).
                print(f"INFO classified: reference f16-complex parse broken; "
                      f"running f16-vs-f32 self-differential cfg={cfg}",
                      flush=True)
                fkw32 = dict(fkw)
                fkw32["complex_f16"] = False
                raw32 = tmp / f"SG32_{i}-D20210201-T000000.raw"
                write_ek80_raw(raw32, **fkw32)
                ed16 = ep.open_raw(str(raw), sonar_model="EK80")
                ed32 = ep.open_raw(str(raw32), sonar_model="EK80")
                for gi in range(1, 4):
                    b16 = ed16.get(f"Sonar/Beam_group{gi}")
                    b32 = ed32.get(f"Sonar/Beam_group{gi}")
                    if (b16 is None) != (b32 is None):
                        fails += 1
                        print(f"FAIL f16 group{gi} presence cfg={cfg}",
                              flush=True)
                        continue
                    if b16 is None:
                        continue
                    for var in ("backscatter_r", "backscatter_i"):
                        if var not in b32.data_vars:
                            continue
                        w, g = _vals(b32, var), _vals(b16, var)
                        if w.shape != g.shape:
                            fails += 1
                            print(f"FAIL f16 group{gi} {var} shape "
                                  f"{g.shape} vs {w.shape} cfg={cfg}",
                                  flush=True)
                            continue
                        with np.errstate(invalid="ignore"):
                            bad = ~(np.isclose(g, w, rtol=1e-3, atol=1e-4)
                                    | (np.isnan(g) & np.isnan(w)))
                        if bad.any():
                            fails += 1
                            print(f"FAIL f16 group{gi} {var} {bad.sum()} "
                                  f"cells cfg={cfg}", flush=True)
                print(f"ok {i} (f16 self-diff) cfg={cfg}", flush=True)
                continue
            fails_before = fails
            parser = ref_parse_mod.ParseEK80(
                str(raw), storage_options={}, sonar_model="EK80")
            parser.parse_raw()
            parser.rectangularize_data(use_swap=False)
            sg = ref_sg_mod.SetGroupsEK80(
                parser, input_file=str(raw), xml_path=None, output_path=None,
                sonar_model="EK80", params=dict(params),
            )
            beams = sg.set_beam()
            ref_env = sg.set_env()
            ed = ep.open_raw(str(raw), sonar_model="EK80")
            for gi, ref_b in enumerate(beams):
                our_b = ed.get(f"Sonar/Beam_group{gi + 1}")
                if (ref_b is None) != (our_b is None):
                    fails += 1
                    print(f"FAIL group{gi + 1} presence cfg={cfg}", flush=True)
                    continue
                if ref_b is None:
                    continue
                rt = np.asarray(ref_b.coords["ping_time"].values)
                if len(rt) != len(np.unique(rt)):
                    fails += 1
                    print(f"FAIL reference kept duplicates g{gi + 1} "
                          f"cfg={cfg}", flush=True)
                    continue
                _cmp_groups(ref_b, our_b, f"group{gi + 1}", cfg)
            our_env = ed["Environment"]
            for var in ("sound_speed_indicative", "temperature", "salinity",
                        "acidity", "depth"):
                if var in ref_env.data_vars and var in our_env.data_vars:
                    w, g = _vals(ref_env, var), _vals(our_env, var)
                    with np.errstate(invalid="ignore"):
                        bad = ~(np.isclose(g, w, rtol=1e-12)
                                | (np.isnan(g) & np.isnan(w)))
                    if bad.any():
                        fails += 1
                        print(f"FAIL env {var} cfg={cfg}", flush=True)

            # Platform leg: NMEA lat/lon (time1), MRU0 attitude (time2),
            # MRU1 KMB position (time3), per-channel transducer offsets
            ref_plat = sg.set_platform()
            our_plat = ed["Platform"]
            for var in ("latitude", "longitude", "pitch", "roll",
                        "vertical_offset", "heading", "latitude_mru1",
                        "longitude_mru1", "water_level", "drop_keel_offset",
                        "transducer_offset_x", "transducer_offset_y",
                        "transducer_offset_z", "frequency_nominal"):
                has_ref = var in ref_plat.data_vars
                has_our = var in our_plat.data_vars
                if has_ref != has_our:
                    fails += 1
                    print(f"FAIL platform presence {var} ref={has_ref} "
                          f"cfg={cfg}", flush=True)
                    continue
                if not has_ref:
                    continue
                w, g = _vals(ref_plat, var), _vals(our_plat, var)
                if w.shape != g.shape:
                    fails += 1
                    print(f"FAIL platform {var} shape {g.shape} vs {w.shape} "
                          f"cfg={cfg}", flush=True)
                    continue
                with np.errstate(invalid="ignore"):
                    bad = ~(np.isclose(g, w, rtol=1e-9, atol=0.0)
                            | (np.isnan(g) & np.isnan(w)))
                if bad.any():
                    fails += 1
                    print(f"FAIL platform {var} {bad.sum()} cells cfg={cfg}",
                          flush=True)
            if "sentence_type" in ref_plat.data_vars:
                rs = np.asarray(ref_plat["sentence_type"].values).astype(str)
                os_ = np.asarray(our_plat["sentence_type"].values).astype(str)
                if not np.array_equal(rs, os_):
                    fails += 1
                    print(f"FAIL platform sentence_type cfg={cfg}", flush=True)
            for tc in ("time1", "time2", "time3"):
                rt = (np.asarray(ref_plat.coords[tc].values,
                                 dtype="datetime64[ns]")
                      if tc in ref_plat.coords else None)
                ot = (np.asarray(our_plat.coords[tc].values,
                                 dtype="datetime64[ns]")
                      if tc in our_plat.coords else None)
                if (rt is None) != (ot is None):
                    fails += 1
                    print(f"FAIL platform coord {tc} presence cfg={cfg}",
                          flush=True)
                elif rt is not None and not np.array_equal(rt, ot):
                    fails += 1
                    print(f"FAIL platform coord {tc} values cfg={cfg}",
                          flush=True)

            # Vendor leg: calibration tables + transceiver metadata.
            # INVERTED FINDING (classified): the reference's set_vendor does
            # np.array(list-of-per-channel-tables) (set_groups_ek80.py:1266),
            # which raises on modern numpy whenever channels carry DIFFERENT
            # pulse_duration/gain/sa table lengths (inhomogeneous sequence);
            # ours NaN-pads to the longest table.  The synth's BB channel has
            # 5 table entries vs 3 on CW/GPT, so any mixed-channel config
            # hits it.
            try:
                ref_vend = sg.set_vendor()
            except ValueError as e:
                if "inhomogeneous" not in str(e):
                    raise
                lens = {len(parser.config_datagram["configuration"][ch]
                            .get("pulse_duration", ()))
                        for ch in parser.config_datagram["configuration"]}
                if len(lens) <= 1:
                    raise  # homogeneous tables should never crash
                pl = _vals(ed["Vendor_specific"], "pulse_length")
                if pl.ndim == 1:
                    pl = pl[None, :]
                if pl.shape[-1] != max(lens) or not np.isnan(
                        np.asarray(pl, dtype="f8")).any():
                    fails += 1
                    print(f"FAIL vendor nan-pad recovery cfg={cfg}",
                          flush=True)
                else:
                    print(f"INFO classified: reference set_vendor crashes on "
                          f"mixed table lengths {sorted(lens)}; ours NaN-pads "
                          f"cfg={cfg}", flush=True)
                ref_vend = None
            our_vend = ed["Vendor_specific"]
            for var in () if ref_vend is None else (
                        "gain_correction", "sa_correction", "pulse_length",
                        "impedance_transceiver",
                        "receiver_sampling_frequency"):
                has_ref = var in ref_vend.data_vars
                has_our = var in our_vend.data_vars
                if has_ref != has_our:
                    fails += 1
                    print(f"FAIL vendor presence {var} ref={has_ref} "
                          f"cfg={cfg}", flush=True)
                    continue
                if not has_ref:
                    continue
                w, g = _vals(ref_vend, var), _vals(our_vend, var)
                if w.shape != g.shape:
                    fails += 1
                    print(f"FAIL vendor {var} shape {g.shape} vs {w.shape} "
                          f"cfg={cfg}", flush=True)
                    continue
                with np.errstate(invalid="ignore"):
                    bad = ~(np.isclose(g, w, rtol=1e-12)
                            | (np.isnan(g) & np.isnan(w)))
                if bad.any():
                    fails += 1
                    print(f"FAIL vendor {var} {bad.sum()} cells cfg={cfg}",
                          flush=True)

            if fm_dup_leg and n_pings > 2:
                # FM-duplicate leg: reference crashes (inverted finding,
                # tests/test_ref_setgroups.py::test_duplicate_ping_fm_inverted)
                # — OUR conversion must equal the duplicate-free conversion.
                fkw2 = dict(fkw)
                fkw2.pop("duplicate_pings", None)
                raw_clean = tmp / f"SGc{i}-D20210201-T000000.raw"
                raw_dup = tmp / f"SGd{i}-D20210201-T000000.raw"
                write_ek80_raw(raw_clean, **fkw2)
                dd = {CH_BB: {int(r2.integers(0, n_pings))}}
                write_ek80_raw(raw_dup, duplicate_pings=dd, **fkw2)
                ed_c = ep.open_raw(str(raw_clean), sonar_model="EK80")
                ed_d = ep.open_raw(str(raw_dup), sonar_model="EK80")
                for gi in range(1, 4):
                    bc = ed_c.get(f"Sonar/Beam_group{gi}")
                    bd = ed_d.get(f"Sonar/Beam_group{gi}")
                    if (bc is None) != (bd is None):
                        fails += 1
                        print(f"FAIL fm-dup group{gi} presence cfg={cfg}",
                              flush=True)
                        continue
                    if bc is None:
                        continue
                    _cmp_groups(bc, bd, f"fm-dup group{gi}", cfg)
            if fails == fails_before:
                print(f"ok {i} cfg={cfg}", flush=True)
        except Exception:
            fails += 1
            print(f"ERROR cfg={cfg}", flush=True)
            traceback.print_exc()
    return fails


MODES = {
    "ek60": soak_ek60,
    "ek60sg": soak_ek60sg,
    "ek80sg": soak_ek80sg,
    "azfp6": soak_azfp6,
    "sidecars": soak_sidecars,
    "regrid": soak_regrid,
    "survey_bb": soak_survey_bb,
    "metrics": soak_metrics,
    "ecs": soak_ecs,
    "ecs80": soak_ecs80,
    "store": soak_store,
    "ad2cp": soak_ad2cp,
    "consolidate": soak_consolidate,
    "survey": soak_survey,
    "azfp": soak_azfp,
    "detectors": soak_detectors,
    "ek80": soak_ek80,
    "mvbs": soak_mvbs,
    "combine": soak_combine,
    "clean": soak_clean,
    "nasc": soak_nasc,
    "platform": soak_platform,
}


def main():
    import numpy as np

    mode = sys.argv[1] if len(sys.argv) > 1 else "ek60"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else np.random.SeedSequence().entropy % (1 << 32)
    _cpu()
    rng = np.random.default_rng(seed)
    print(f"soak mode={mode} n={n} seed={seed}", flush=True)
    fails = MODES[mode](n, rng)
    print(f"SOAK DONE: mode={mode} {n} configs, {fails} failures", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
