"""Unit tests for the xrlite labeled-array core."""

import numpy as np
import pytest

from echopype_tpu import xrlite as xrl
from echopype_tpu.xrlite import DataArray, Dataset


def make_da():
    return DataArray(
        np.arange(24, dtype="f8").reshape(2, 3, 4),
        ("channel", "ping_time", "range_sample"),
        coords={
            "channel": ["ch1", "ch2"],
            "ping_time": np.array(
                ["2020-01-01T00:00:00", "2020-01-01T00:00:01", "2020-01-01T00:00:02"],
                dtype="datetime64[ns]",
            ),
            "range_sample": np.arange(4),
        },
        name="Sv",
    )


class TestDataArray:
    def test_construction(self):
        da = make_da()
        assert da.dims == ("channel", "ping_time", "range_sample")
        assert da.sizes == {"channel": 2, "ping_time": 3, "range_sample": 4}
        assert da.coords["channel"].values.tolist() == ["ch1", "ch2"]

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError):
            DataArray(np.zeros((2, 3)), ("a",))

    def test_coord_size_mismatch_raises(self):
        with pytest.raises(ValueError):
            DataArray(np.zeros(3), ("x",), coords={"x": [1, 2]})

    def test_isel_int_drops_dim(self):
        da = make_da()
        out = da.isel(channel=0)
        assert out.dims == ("ping_time", "range_sample")
        np.testing.assert_array_equal(out.values, da.values[0])
        assert out.coords["channel"].ndim == 0

    def test_isel_slice_and_array(self):
        da = make_da()
        out = da.isel(ping_time=slice(1, 3), range_sample=np.array([0, 2]))
        assert out.shape == (2, 2, 2)
        np.testing.assert_array_equal(out.values, da.values[:, 1:3][:, :, [0, 2]])

    def test_sel_by_label(self):
        da = make_da()
        out = da.sel(channel="ch2")
        np.testing.assert_array_equal(out.values, da.values[1])

    def test_sel_nearest_datetime(self):
        da = make_da()
        out = da.sel(
            ping_time=np.datetime64("2020-01-01T00:00:00.4", "ns"), method="nearest"
        )
        np.testing.assert_array_equal(out.values, da.values[:, 0])

    def test_sel_time_slice(self):
        da = make_da()
        out = da.sel(
            ping_time=slice(
                np.datetime64("2020-01-01T00:00:01"), np.datetime64("2020-01-01T00:00:02")
            )
        )
        assert out.sizes["ping_time"] == 2

    def test_broadcast_binary_op(self):
        da = make_da()
        per_chan = DataArray([10.0, 20.0], ("channel",), coords={"channel": ["ch1", "ch2"]})
        out = da + per_chan
        assert out.dims == ("channel", "ping_time", "range_sample")
        np.testing.assert_allclose(out.values[0], da.values[0] + 10)
        np.testing.assert_allclose(out.values[1], da.values[1] + 20)

    def test_broadcast_new_dims(self):
        a = DataArray(np.ones((2, 3)), ("x", "y"))
        b = DataArray(np.arange(4, dtype="f8"), ("z",))
        out = a * b
        assert out.dims == ("x", "y", "z")
        assert out.shape == (2, 3, 4)

    def test_scalar_ops(self):
        da = make_da()
        np.testing.assert_allclose((10 * np.log10(10 ** (da / 10))).values, da.values)
        np.testing.assert_allclose((2 - da).values, 2 - da.values)

    def test_reductions_skipna(self):
        da = make_da()
        da.values[0, 0, 0] = np.nan
        m = da.mean("ping_time")
        assert m.dims == ("channel", "range_sample")
        expected = np.nanmean(da.values, axis=1)
        np.testing.assert_allclose(m.values, expected)

    def test_reduction_multi_dim(self):
        da = make_da()
        out = da.mean(["ping_time", "range_sample"])
        assert out.dims == ("channel",)

    def test_where_and_fillna(self):
        da = make_da()
        masked = da.where(da > 5)
        assert np.isnan(masked.values[0, 0, 0])
        filled = masked.fillna(-1.0)
        assert filled.values[0, 0, 0] == -1.0

    def test_where_with_other_dataarray(self):
        da = make_da()
        out = da.where(da > 5, da * 0)
        assert out.values[0, 0, 0] == 0.0

    def test_interp_linear(self):
        x = np.array([0.0, 1.0, 2.0])
        da = DataArray(np.array([[0.0, 10.0, 20.0]]), ("c", "x"), coords={"x": x})
        out = da.interp(x=np.array([0.5, 1.5]))
        np.testing.assert_allclose(out.values, [[5.0, 15.0]])

    def test_interp_extrapolate(self):
        x = np.array([0.0, 1.0])
        da = DataArray(np.array([0.0, 10.0]), ("x",), coords={"x": x})
        out = da.interp(x=np.array([-1.0, 2.0]), kwargs={"fill_value": "extrapolate"})
        np.testing.assert_allclose(out.values, [-10.0, 20.0])

    def test_interp_outside_nan(self):
        x = np.array([0.0, 1.0])
        da = DataArray(np.array([0.0, 10.0]), ("x",), coords={"x": x})
        out = da.interp(x=np.array([-1.0, 0.5]))
        assert np.isnan(out.values[0]) and out.values[1] == 5.0

    def test_interp_nan_propagates(self):
        """Round-5 facade review: real xarray's interp is scipy-backed — a
        NaN sample poisons every interval it bounds; it is NOT dropped.  The
        previous facade interpolated over NaN gaps, silently diverging from
        real echopype on partial-NaN inputs (add_location on NaN-holed NMEA
        positions, reference consolidate/loc_utils.py 'some_nan' warning)."""
        x = np.arange(5.0)
        y = np.array([0.0, 10.0, np.nan, 30.0, 40.0])
        da = DataArray(y, ("x",), coords={"x": x})
        out = da.interp(x=np.array([0.5, 1.5, 2.5, 3.5, 2.0]))
        np.testing.assert_allclose(out.values[0], 5.0)
        assert np.isnan(out.values[1]) and np.isnan(out.values[2])
        np.testing.assert_allclose(out.values[3], 35.0)
        # exact hit on the NaN sample is NaN too
        assert np.isnan(out.values[4])
        # nearest: the nearest sample may BE NaN
        near = da.interp(x=np.array([2.2]), method="nearest")
        assert np.isnan(near.values[0])

    def test_idxmin(self):
        da = DataArray(
            np.array([[3.0, 1.0, 2.0], [0.5, 2.0, 9.0]]),
            ("channel", "plb"),
            coords={"plb": np.array([10, 20, 30])},
        )
        out = da.idxmin("plb")
        np.testing.assert_array_equal(out.values, [20, 10])

    def test_transpose(self):
        da = make_da()
        out = da.transpose("range_sample", "channel", "ping_time")
        assert out.shape == (4, 2, 3)

    def test_expand_squeeze(self):
        da = make_da().isel(channel=0)
        out = da.expand_dims("channel")
        assert out.dims[0] == "channel" and out.shape[0] == 1
        back = out.squeeze("channel")
        assert back.dims == da.dims

    def test_cumsum_diff(self):
        da = DataArray(np.array([1.0, 2.0, 4.0]), ("x",), coords={"x": [0, 1, 2]})
        np.testing.assert_allclose(da.cumsum("x").values, [1, 3, 7])
        d = da.diff("x")
        np.testing.assert_allclose(d.values, [1, 2])
        np.testing.assert_array_equal(d.coords["x"].values, [1, 2])

    def test_dropna(self):
        da = DataArray(np.array([1.0, np.nan, 3.0]), ("x",), coords={"x": [0, 1, 2]})
        out = da.dropna("x")
        np.testing.assert_allclose(out.values, [1, 3])

    def test_rename_dims(self):
        da = make_da().rename({"ping_time": "t"})
        assert "t" in da.dims and "t" in da.coords

    def test_pad(self):
        da = DataArray(np.ones((2, 3)), ("a", "b"))
        out = da.pad({"b": (0, 2)})
        assert out.shape == (2, 5)
        assert np.isnan(out.values[:, 3:]).all()


class TestOps:
    def test_concat_existing_dim(self):
        da = make_da()
        out = xrl.concat([da, da], "ping_time")
        assert out.sizes["ping_time"] == 6
        assert out.coords["ping_time"].size == 6

    def test_concat_new_dim(self):
        da = make_da().isel(channel=0, drop=True)
        out = xrl.concat([da, da, da], "filenames")
        assert out.dims[0] == "filenames" and out.shape[0] == 3

    def test_where_module(self):
        a = DataArray(np.array([1.0, 2.0]), ("x",))
        out = xrl.where(a > 1.5, a, -1.0)
        np.testing.assert_allclose(out.values, [-1.0, 2.0])

    def test_merge(self):
        ds = xrl.merge([make_da().to_dataset(), make_da().rename("Sv2").to_dataset()])
        assert set(ds.data_vars) == {"Sv", "Sv2"}


class TestDataset:
    def make_ds(self):
        ds = Dataset(
            {
                "Sv": make_da(),
                "frequency_nominal": (
                    "channel",
                    np.array([18000.0, 38000.0]),
                ),
            },
            attrs={"note": "hi"},
        )
        return ds

    def test_basic(self):
        ds = self.make_ds()
        assert set(ds.data_vars) == {"Sv", "frequency_nominal"}
        assert ds.sizes["channel"] == 2
        sv = ds["Sv"]
        assert "ping_time" in sv.coords

    def test_isel_sel(self):
        ds = self.make_ds()
        out = ds.isel(ping_time=0)
        assert "ping_time" not in out["Sv"].dims
        out2 = ds.sel(channel="ch1")
        np.testing.assert_allclose(out2["frequency_nominal"].values, 18000.0)

    def test_swap_dims(self):
        ds = self.make_ds()
        ds2 = ds.assign_coords(frequency_nominal=("channel", [18000.0, 38000.0]))
        out = ds2.swap_dims({"channel": "frequency_nominal"})
        assert "frequency_nominal" in out["Sv"].dims

    def test_setitem_checks_sizes(self):
        ds = self.make_ds()
        with pytest.raises(ValueError):
            ds["bad"] = ("channel", np.zeros(5))

    def test_where(self):
        ds = self.make_ds()
        cond = ds["Sv"] > 5
        out = ds.where(cond)
        assert np.isnan(out["Sv"].values[0, 0, 0])

    def test_interp_ds(self):
        ds = Dataset(
            {"v": (("x",), np.array([0.0, 10.0]))},
            coords={"x": np.array([0.0, 1.0])},
        )
        out = ds.interp(x=np.array([0.5]))
        np.testing.assert_allclose(out["v"].values, [5.0])

    def test_concat_datasets(self):
        ds = self.make_ds()
        out = xrl.concat([ds, ds], "ping_time")
        assert out.sizes["ping_time"] == 6
        # var without ping_time untouched
        assert out["frequency_nominal"].sizes["channel"] == 2

    def test_drop_rename_assign(self):
        ds = self.make_ds()
        out = ds.drop_vars("frequency_nominal").rename({"Sv": "TS"}).assign_attrs(a=1)
        assert "TS" in out.data_vars and out.attrs["a"] == 1


class TestRenameVars:
    def test_rename_vars(self):
        import numpy as np
        from echopype_tpu.xrlite import Dataset

        ds = Dataset({"a": (("x",), np.arange(3.0)), "b": (("x",), np.ones(3))},
                     coords={"x": np.arange(3)}, attrs={"k": "v"})
        out = ds.rename_vars({"a": "a2"}, b="b2")
        assert set(out.data_vars) == {"a2", "b2"}
        assert set(ds.data_vars) == {"a", "b"}  # original untouched
        assert out.attrs["k"] == "v"
        import pytest
        with pytest.raises(ValueError, match="nope"):
            ds.rename_vars({"nope": "x2"})


class TestXarrayApiParity:
    def _ds(self):
        import numpy as np
        from echopype_tpu.xrlite import Dataset

        rng = np.random.default_rng(0)
        v = rng.normal(0, 1, (3, 4))
        v[0, 0] = np.nan
        return Dataset(
            {"a": (("x", "y"), v), "b": (("x",), np.array([3.0, 1.0, 2.0]))},
            coords={"x": np.array([30, 10, 20]), "y": np.arange(4)},
        ), v

    def test_dataset_reductions(self):
        import numpy as np

        ds, v = self._ds()
        np.testing.assert_allclose(ds.sum("y")["a"].values, np.nansum(v, axis=1))
        np.testing.assert_allclose(ds.max("y")["a"].values, np.nanmax(v, axis=1))
        np.testing.assert_allclose(ds.std("y")["a"].values, np.nanstd(v, axis=1))
        np.testing.assert_allclose(ds.median("y")["a"].values, np.nanmedian(v, axis=1))
        np.testing.assert_allclose(ds.count("y")["a"].values, [3, 4, 4])

    def test_dataset_fillna_clip_pipe(self):
        import numpy as np

        ds, v = self._ds()
        filled = ds.fillna(0.0)
        assert not np.isnan(filled["a"].values).any()
        assert np.isnan(ds["a"].values[0, 0])  # original untouched
        clipped = ds.clip(min=0.0)
        assert np.nanmin(clipped["a"].values) >= 0.0
        assert ds.pipe(lambda d, k: d[k].dims, "a") == ("x", "y")

    def test_dataset_sortby_squeeze(self):
        import numpy as np
        from echopype_tpu.xrlite import Dataset

        ds, v = self._ds()
        s = ds.sortby("x")
        np.testing.assert_array_equal(s.coords["x"].values, [10, 20, 30])
        np.testing.assert_allclose(s["b"].values, [1.0, 2.0, 3.0])
        ds2 = Dataset({"c": (("x", "y"), np.ones((1, 4)))}, coords={"y": np.arange(4)})
        sq = ds2.squeeze()
        assert sq["c"].dims == ("y",)

    def test_dataarray_idxmax_round(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        da = DataArray(
            np.array([[1.0, 5.0, 2.0], [7.0, np.nan, 3.0]]),
            ("p", "r"),
            coords={"r": np.array([10.0, 20.0, 30.0])},
        )
        np.testing.assert_allclose(da.idxmax("r").values, [20.0, 10.0])
        np.testing.assert_allclose(da.round().values[0], [1.0, 5.0, 2.0])
        assert da.pipe(lambda x: x.dims) == ("p", "r")

    def test_dataarray_plot(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        da = DataArray(np.random.default_rng(0).normal(-70, 5, (10, 20)),
                       ("range_sample", "ping_time"), name="Sv")
        m = da.plot(cmap="ep.ek500")
        plt.gcf().savefig(tmp_path / "echogram.png")
        assert (tmp_path / "echogram.png").stat().st_size > 0
        da1 = DataArray(np.arange(5.0), ("ping_time",), name="nasc")
        da1.plot()


class TestRound3FacadeSurface:
    """coarsen / reindex / multi-dim interp / multi-output apply_ufunc /
    coords normalization added for the commongrid+clean oracle execution."""

    def test_coarsen_pad_mean(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        da = DataArray(
            np.arange(14.0).reshape(2, 7), ("c", "p"),
            coords={"c": ["a", "b"], "p": np.arange(7.0)},
        )
        out = da.coarsen(p=3, boundary="pad").mean(skipna=True)
        np.testing.assert_allclose(out.values, [[1, 4, 6], [8, 11, 13]])
        np.testing.assert_allclose(out.coords["p"].values, [1.0, 4.0, 6.0])

    def test_coarsen_strict_raises(self):
        import numpy as np
        import pytest
        from echopype_tpu.xrlite import DataArray

        da = DataArray(np.arange(7.0), ("p",))
        with pytest.raises(ValueError, match="not a multiple"):
            da.coarsen(p=3).mean()

    def test_coarsen_datetime_coord(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        t = np.datetime64("2022-01-01", "ns") + np.arange(6).astype(
            "timedelta64[s]"
        ).astype("timedelta64[ns]")
        da = DataArray(np.arange(6.0), ("t",), coords={"t": t})
        out = da.coarsen(t=2, boundary="pad").mean()
        assert str(out.coords["t"].values.dtype) == "datetime64[ns]"
        assert out.coords["t"].values[0] == t[0] + np.timedelta64(500, "ms")

    def test_reindex_ffill_and_exact(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        da = DataArray(np.array([1.0, 2.0, 3.0]), ("p",), coords={"p": [0, 4, 8]})
        ff = da.reindex({"p": [0, 1, 5, 9]}, method="ffill")
        np.testing.assert_allclose(ff.values, [1, 1, 2, 3])
        ex = da.reindex({"p": [0, 4, 6]})
        np.testing.assert_allclose(ex.values, [1, 2, np.nan])

    def test_interp_multidim(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        x, y = np.linspace(0, 1, 5), np.linspace(0, 2, 7)
        da = DataArray(
            np.add.outer(x, 3.0 * y), ("x", "y"), coords={"x": x, "y": y}
        )
        out = da.interp(x=np.array([0.125, 0.6]), y=np.array([0.5, 1.25]))
        want = np.add.outer([0.125, 0.6], 3.0 * np.array([0.5, 1.25]))
        np.testing.assert_allclose(out.values, want, rtol=1e-12)

    def test_apply_ufunc_multi_output(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray
        from echopype_tpu.xrlite.xarray_compat import apply_ufunc

        da = DataArray(np.arange(12.0).reshape(3, 4), ("c", "r"))
        lo, hi = apply_ufunc(
            lambda v: (v.min(), v.max()),
            da,
            input_core_dims=[["r"]],
            output_core_dims=[[], []],
            vectorize=True,
        )
        np.testing.assert_allclose(lo.values, [0, 4, 8])
        np.testing.assert_allclose(hi.values, [3, 7, 11])

    def test_coords_tuple_assignment(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray, Dataset

        ds = Dataset({"v": (("p",), np.arange(3.0))})
        ds.coords["p"] = ("p", np.array([10, 20, 30]), {"units": "m"})
        assert ds.coords["p"].attrs["units"] == "m"
        assert ds.sizes == {"p": 3}
        da = DataArray(np.arange(3.0), ("p",))
        da.coords["p"] = np.array([1, 2, 3])
        assert da.coords["p"].dims == ("p",)

    def test_virtual_dim_coordinate(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        da = DataArray(np.zeros((2, 5)), ("c", "p"))
        np.testing.assert_array_equal(da["p"].values, np.arange(5))

    def test_flox_shim_binned_reduce(self):
        import numpy as np
        import pandas as pd
        from echopype_tpu.xrlite import DataArray
        from echopype_tpu.xrlite.flox_compat import xarray_reduce

        vals = DataArray(
            np.array([[1.0, 2.0, np.nan, 4.0], [10.0, 20.0, 30.0, 40.0]]),
            ("c", "p"),
            coords={"c": ["a", "b"], "p": np.arange(4.0)},
            name="v",
        )
        by_c = DataArray(np.array(["a", "b"], dtype=object), ("c",), name="c")
        by_p = DataArray(np.array([0.0, 0.9, 2.4, 2.6]), ("p",), name="p")
        iv = pd.IntervalIndex.from_breaks([0.0, 1.0, 2.0, 3.0], closed="left")
        out = xarray_reduce(
            vals, by_c, by_p, func="nanmean",
            expected_groups=(None, iv), isbin=[False, True],
        )
        assert out.dims == ("c", "p_bins")
        np.testing.assert_allclose(
            out.values, [[1.5, np.nan, 4.0], [15.0, np.nan, 35.0]]
        )
        assert out.coords["p_bins"].values[0].left == 0.0

    def test_reindex_unsorted_exact(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        da = DataArray(
            np.array([10.0, 20.0, 30.0]), ("ch",),
            coords={"ch": np.array(["b", "a", "c"], dtype=object)},
        )
        out = da.reindex({"ch": np.array(["a", "b", "c"], dtype=object)})
        np.testing.assert_allclose(out.values, [20.0, 10.0, 30.0])

    def test_reindex_datetime_nat_fill(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        t = np.array(["2020-01-01", "2020-01-02"], dtype="datetime64[ns]")
        da = DataArray(t.copy(), ("p",), coords={"p": [0, 1]})
        out = da.reindex({"p": [0, 1, 2]})
        assert out.values.dtype == np.dtype("datetime64[ns]")
        assert np.isnat(out.values[2]) and out.values[0] == t[0]

    def test_reindex_ffill_unsorted_raises(self):
        import numpy as np
        import pytest
        from echopype_tpu.xrlite import DataArray

        da = DataArray(np.arange(3.0), ("p",), coords={"p": [3, 1, 2]})
        with pytest.raises(ValueError, match="monotonically"):
            da.reindex({"p": [1, 2]}, method="ffill")

    def test_resample_skipna_false_poisons(self):
        import numpy as np
        from echopype_tpu.xrlite import DataArray

        t = np.datetime64("2020-01-01", "ns") + np.arange(6).astype(
            "timedelta64[s]"
        ).astype("timedelta64[ns]")
        da = DataArray(
            np.array([1.0, np.nan, 3.0, 4.0, 5.0, 6.0]), ("ping_time",),
            coords={"ping_time": t},
        )
        skip = da.resample(ping_time="2s").mean()
        poison = da.resample(ping_time="2s", skipna=False).mean()
        np.testing.assert_allclose(skip.values, [1.0, 3.5, 5.5])
        assert np.isnan(poison.values[0])
        np.testing.assert_allclose(poison.values[1:], [3.5, 5.5])

    def test_expand_dims_multikey_order(self):
        import numpy as np
        from echopype_tpu.xrlite import Dataset

        ds = Dataset({"v": (("x",), np.arange(3.0))})
        out = ds.expand_dims({"a": ["p"], "b": ["q"]})
        assert out["v"].dims == ("a", "b", "x")


class TestRound4ReviewRegressions:
    """Self-review fixes: attrs-setter aliasing, idxmin datetime coords."""

    def test_attrs_self_assignment_not_erased(self):
        import numpy as np

        from echopype_tpu.xrlite import Dataset

        ds = Dataset({"x": (("p",), np.arange(3.0))})
        ds["x"].attrs["units"] = "m"
        # the wrapper shares the stored attrs dict (xarray Variable
        # semantics), so this aliases the target — must not wipe it
        ds["x"].attrs = ds["x"].attrs
        assert ds["x"].attrs == {"units": "m"}
        ds["x"].attrs = dict(ds["x"].attrs, extra=1)
        assert ds["x"].attrs == {"units": "m", "extra": 1}

    def test_idxmin_datetime_coord_all_nan_slice(self):
        import numpy as np

        from echopype_tpu.xrlite import DataArray

        t = np.datetime64("2020-01-01", "ns") + np.arange(3).astype(
            "timedelta64[s]"
        ).astype("timedelta64[ns]")
        vals = np.array([[3.0, 1.0, 2.0], [np.nan, np.nan, np.nan]])
        da = DataArray(vals, ("ch", "t"), coords={"t": t})
        out = da.idxmin("t")
        assert out.values.dtype.kind == "M"  # stays datetime64, not f8
        assert out.values[0] == t[1]
        assert np.isnat(out.values[1])  # xarray: NaT on the all-NaN slice

    def test_data_setter_copy_rebinds_original_untouched(self):
        import numpy as np

        from echopype_tpu.xrlite import Dataset

        ds = Dataset({"Sv": (("p",), np.arange(4.0))})
        # write-through only for wrappers handed out by Dataset.__getitem__
        w = ds["Sv"]
        w.data = np.arange(4.0) + 1
        np.testing.assert_array_equal(ds["Sv"].values, np.arange(4.0) + 1)
        # a copy REBINDS (xarray semantics): the original must not mutate
        b = ds["Sv"].copy()
        b.data = np.full(4, -1.0)
        np.testing.assert_array_equal(ds["Sv"].values, np.arange(4.0) + 1)
        np.testing.assert_array_equal(b.values, np.full(4, -1.0))

    def test_encoding_self_assignment_not_erased(self):
        import numpy as np

        from echopype_tpu.xrlite import Dataset

        ds = Dataset(coords={"t": np.arange(3.0)})
        ds.coords["t"].encoding.update({"units": "s", "dtype": "int64"})
        w = ds["t"]
        w.encoding = w.encoding
        assert ds.coords["t"].encoding == {"units": "s", "dtype": "int64"}


class TestRound5AlignmentAudit:
    """Facade pass 2 (round 5): xarray semantics pinned from the live probe —
    binary-op label alignment, broadcasting, and the rare-method surface the
    reference actually uses."""

    def test_binary_op_inner_join_alignment(self):
        a = DataArray(np.array([1.0, 2.0, 3.0]), ("x",),
                      coords={"x": np.array([0, 1, 2])}, name="a")
        b = DataArray(np.array([10.0, 20.0, 30.0]), ("x",),
                      coords={"x": np.array([1, 2, 3])}, name="b")
        c = a + b
        np.testing.assert_array_equal(np.asarray(c.coords["x"].values), [1, 2])
        np.testing.assert_array_equal(np.asarray(c.values), [12.0, 23.0])

    def test_binary_op_transposed_operand_aligns_by_name(self):
        h1 = DataArray(np.ones((2, 3)), ("p", "r"), name="h1")
        h3 = DataArray(np.arange(6.0).reshape(3, 2), ("r", "p"), name="h3")
        s = h1 + h3
        assert s.dims == ("p", "r")
        np.testing.assert_array_equal(
            np.asarray(s.values), 1.0 + np.arange(6.0).reshape(3, 2).T
        )

    def test_where_broadcasts_condition(self):
        e = DataArray(np.arange(6.0).reshape(2, 3), ("p", "r"), name="e")
        cond = DataArray(np.array([True, False]), ("p",), name="c")
        out = np.asarray(e.where(cond).values)
        assert np.isfinite(out[0]).all() and np.isnan(out[1]).all()

    def test_concat_keeps_first_attrs(self):
        from echopype_tpu.xrlite import concat

        g1 = DataArray(np.array([1.0]), ("x",), attrs={"u": "dB"}, name="g")
        g2 = DataArray(np.array([2.0]), ("x",), attrs={"u": "other"}, name="g")
        assert concat([g1, g2], dim="x").attrs == {"u": "dB"}

    def test_reference_used_rare_methods(self):
        # the ONLY drop= forms the reference uses (set_groups_ek80 FM/CW
        # split; cal_params.py:311) — must stay supported
        ds = Dataset()
        ds["v"] = DataArray(np.arange(4.0), ("t",), name="v")
        ds["transmit_type"] = DataArray(
            np.array(["LFM", "CW", "LFM", "CW"], dtype=object), ("t",),
            name="transmit_type",
        )
        w = ds.where(ds["transmit_type"] == "LFM", drop=True)
        np.testing.assert_array_equal(np.asarray(w["v"].values), [0.0, 2.0])
        a = DataArray(np.arange(3.0), ("pulse_length_bin",),
                      coords={"pulse_length_bin": np.array([0, 1, 2])}, name="a")
        s = a.sel(pulse_length_bin=1, drop=True)
        assert float(s.values) == 1.0 and "pulse_length_bin" not in s.coords


class TestGroupbyDropDuplicates:
    """Facade methods added for the reference's duplicate-ping checker
    (ek_duplicates.py: Dataset.groupby + drop_duplicates) — xarray parity."""

    def _ds(self):
        ds = Dataset()
        t = np.array(["2021-01-01T00:00:00", "2021-01-01T00:00:02",
                      "2021-01-01T00:00:00", "2021-01-01T00:00:01"],
                     dtype="datetime64[ns]")
        ds.coords["ping_time"] = DataArray(t, ("ping_time",), name="ping_time")
        ds["v"] = DataArray(np.array([10.0, 20.0, 30.0, 40.0]),
                            ("ping_time",), name="v")
        return ds

    def test_groupby_sorted_keys_and_subsets(self):
        ds = self._ds()
        groups = ds.groupby("ping_time")
        keys = [k for k, _ in groups]
        assert keys == sorted(keys)
        assert len(groups) == 3
        # the duplicated key's subset has both rows, file order preserved
        dup = dict((np.datetime64(k, "s").astype(str), g) for k, g in groups)
        g0 = dup["2021-01-01T00:00:00"]
        np.testing.assert_array_equal(np.asarray(g0["v"].values), [10.0, 30.0])

    def test_groupby_dataarray(self):
        da = self._ds()["v"]
        groups = da.groupby("ping_time")
        assert [len(np.atleast_1d(g.values)) for _, g in groups] == [2, 1, 1]

    def test_drop_duplicates_keep_first_order_preserved(self):
        ds = self._ds()
        out = ds.drop_duplicates(dim="ping_time")
        # xarray keeps first occurrence in ORIGINAL order (no sort)
        np.testing.assert_array_equal(np.asarray(out["v"].values),
                                      [10.0, 20.0, 40.0])
        assert len(np.unique(np.asarray(out.coords["ping_time"].values))) == 3

    def test_drop_duplicates_keep_last(self):
        out = self._ds().drop_duplicates(dim="ping_time", keep="last")
        np.testing.assert_array_equal(np.asarray(out["v"].values),
                                      [20.0, 30.0, 40.0])

    def test_drop_duplicates_dataarray(self):
        da = self._ds()["v"]
        out = da.drop_duplicates(dim="ping_time")
        np.testing.assert_array_equal(np.asarray(out.values), [10.0, 20.0, 40.0])

    def test_argmin_argmax_dimless_and_axis(self):
        da = DataArray(np.array([[3.0, np.nan], [1.0, 5.0]]), ("a", "b"),
                       name="x")
        assert int(da.argmin().values) == 2  # flattened, NaN-skipping
        assert int(da.argmax().values) == 3
        np.testing.assert_array_equal(
            np.asarray(da.argmin(axis=0).values), [1, 1])

    def test_assign_callable(self):
        ds = Dataset()
        ds["v"] = DataArray(np.arange(3.0), ("t",), name="v")
        out = ds.assign(w=lambda d: d["v"] * 2)
        np.testing.assert_array_equal(np.asarray(out["w"].values),
                                      [0.0, 2.0, 4.0])

    def test_concat_data_vars_all_expands_dimless(self):
        # xarray concat(data_vars="all"): variables LACKING the concat dim
        # are expanded along it, one slot per object (the reference's
        # merge_save relies on this for transmit_frequency_start/stop,
        # set_groups_ek80.py:1071-1084)
        from echopype_tpu.xrlite.ops import concat

        dss = []
        for k in range(2):
            ds = Dataset()
            ds.coords["ping_time"] = DataArray(
                np.arange(3), ("ping_time",), name="ping_time")
            ds.coords["channel"] = DataArray(
                np.array([f"ch{k}"], dtype=object), ("channel",), name="channel")
            ds["v"] = DataArray(np.full((1, 3), float(k)),
                                ("channel", "ping_time"), name="v")
            ds["tfs"] = DataArray(np.full(3, 10.0 * (k + 1)),
                                  ("ping_time",), name="tfs")
            dss.append(ds)
        out = concat(dss, dim="channel", data_vars="all")
        assert out["tfs"].dims == ("channel", "ping_time")
        np.testing.assert_array_equal(
            np.asarray(out["tfs"].values),
            [[10.0] * 3, [20.0] * 3])
        # default ("minimal") keeps the first object's variable un-expanded
        out2 = concat(dss, dim="channel")
        assert out2["tfs"].dims == ("ping_time",)
