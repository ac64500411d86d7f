"""Host IO helpers: pyarrow-accelerated reads, compact writes."""

import numpy as np
import pandas as pd

from osteosarcoma_diffusionmodel_tpu.utils.io import (
    read_matrix_csv,
    write_matrix_csv,
)


def test_roundtrip_with_index(tmp_path, rng):
    df = pd.DataFrame(
        rng.normal(size=(20, 5)).astype(np.float32),
        index=[f"S{i}" for i in range(20)],
        columns=[f"G{i}" for i in range(5)],
    )
    write_matrix_csv(df, tmp_path / "m.csv")
    back = read_matrix_csv(tmp_path / "m.csv")
    assert list(back.index) == list(df.index)
    assert list(back.columns) == list(df.columns)
    np.testing.assert_allclose(back.values, df.values, rtol=1e-5)


def test_roundtrip_no_index(tmp_path, rng):
    df = pd.DataFrame(rng.normal(size=(10, 3)), columns=["a", "b", "c"])
    write_matrix_csv(df, tmp_path / "n.csv", index=False)
    back = read_matrix_csv(tmp_path / "n.csv", index_col=None)
    assert list(back.columns) == ["a", "b", "c"]
    np.testing.assert_allclose(back.values, df.values, rtol=1e-5)


def test_compact_floats_smaller(tmp_path, rng):
    df = pd.DataFrame(rng.normal(size=(100, 50)).astype(np.float32))
    df.columns = [str(c) for c in df.columns]
    write_matrix_csv(df, tmp_path / "compact.csv", index=False)
    df.to_csv(tmp_path / "full.csv", index=False)
    assert (tmp_path / "compact.csv").stat().st_size < (
        tmp_path / "full.csv"
    ).stat().st_size


def test_env_flag_semantics(monkeypatch):
    from osteosarcoma_diffusionmodel_tpu.utils.io import env_flag

    monkeypatch.delenv("OSDM_FLAG_X", raising=False)
    assert env_flag("OSDM_FLAG_X") is False
    assert env_flag("OSDM_FLAG_X", default=True) is True
    for off in ("", "0", "false", "False", "no", "off", " 0 "):
        monkeypatch.setenv("OSDM_FLAG_X", off)
        assert env_flag("OSDM_FLAG_X") is False, repr(off)
    for on in ("1", "true", "yes", "on", "anything"):
        monkeypatch.setenv("OSDM_FLAG_X", on)
        assert env_flag("OSDM_FLAG_X") is True, repr(on)
