"""Validation-layer tests."""

import numpy as np

from hcunet_tpu.analysis.validate import (
    StudyAggregate,
    dice_score,
    gfp_histograms,
    parse_experiment_metadata,
    pixel_error_rates,
)


def test_dice_and_error_rates():
    truth = np.zeros((10, 10), bool)
    truth[2:8, 2:8] = True
    pred = np.zeros((10, 10), bool)
    pred[2:8, 2:5] = True  # half coverage, no false positives
    d = dice_score(pred, truth)
    assert 0.4 < d < 0.7
    missed, false = pixel_error_rates(pred, truth)
    assert missed == 0.5 and false == 0.0
    assert dice_score(truth, truth) > 0.999


def test_gfp_histograms_shapes(rng):
    img = rng.random((10, 10, 3, 4))
    m = rng.random((10, 10, 3)) > 0.5
    h = gfp_histograms(img, m, ~m, channel=1, bins=20)
    assert h["auto"].shape == (20,) and h["manual"].shape == (20,)
    assert h["edges"].shape == (21,)


def test_parse_experiment_metadata():
    meta = parse_experiment_metadata(
        "/data/Jul 18 AAV2-PHP.B-CMV m2 G80 L5 cochlea"
    )
    assert meta["promoter"] == "CMV"
    assert meta["animal"] == "2"
    assert meta["gain"] == "80"
    assert meta["laser"] == "5"
    assert meta["day"] == "Jul 18"
    assert meta["virus"].startswith("AAV2")


def test_study_aggregate_and_regression():
    from hcunet_tpu.analysis.haircell import HairCell

    agg = StudyAggregate()
    for gain, gfp in [(10, 1.0), (20, 2.1), (30, 2.9)]:
        cell = HairCell([0, 0, 0, 1, 1, 1], [0, 0, 0], unique_id=1)
        cell.signal_stats = {"gfp": {"mean": gfp, "std": 0.1, "median": gfp}}
        cell.gfp_stats = cell.signal_stats["gfp"]
        agg.add_image(f"/study/Feb 6 CMV m1 G{gain} L1", [cell])
    df = agg.dataframe()
    assert len(df) == 3 and "gfp_mean" in df.columns
    reg = agg.gfp_vs_gain_regression()
    assert reg is not None and reg["n"] == 3
    assert 0.08 < reg["slope"] < 0.11 and reg["r2"] > 0.95


def test_load_legacy_cells_module_rename(tmp_path):
    """Reference-era all_cells.pkl load with the module-rename shim
    (``/root/reference/validate.py:16-31``): classes pickled under the
    historical ``haircell`` module resolve without it existing."""
    import pickle
    import sys
    import types

    import torch

    from hcunet_tpu.analysis.validate import load_legacy_cells

    legacy = types.ModuleType("haircell")

    class HairCell:  # stand-in for the reference class being pickled
        pass

    HairCell.__module__ = "haircell"
    HairCell.__qualname__ = "HairCell"
    legacy.HairCell = HairCell
    sys.modules["haircell"] = legacy
    try:
        c = HairCell()
        c.unique_id = 7
        c.volume = 1.5e-16
        c.is_bad = False
        c.distance_from_apex = []
        c.signal_stats = {
            "gfp": {"mean": torch.tensor(0.5), "std": torch.tensor(0.1),
                    "median": 0.4}
        }
        c.gfp_stats = {"mean": torch.tensor(0.5)}
        p = tmp_path / "all_cells.pkl"
        with open(p, "wb") as f:
            pickle.dump([c], f)
    finally:
        del sys.modules["haircell"]

    cells = load_legacy_cells(str(p))
    assert len(cells) == 1
    got = cells[0]
    assert got.unique_id == 7
    assert isinstance(got.signal_stats["gfp"]["mean"], float)
    assert got.signal_stats["gfp"]["mean"] == 0.5

    agg = StudyAggregate()
    agg.add_image("/study/Feb 6 CMV m1 G10 L1", cells)
    assert len(agg.rows) == 1


def test_study_figures_saved(tmp_path):
    from hcunet_tpu.analysis.haircell import HairCell

    agg = StudyAggregate()
    for gain, gfp in [(10, 1.0), (20, 2.1), (30, 2.9)]:
        cell = HairCell([0, 0, 0, 1, 1, 1], [0, 0, 0], unique_id=1)
        cell.signal_stats = {"gfp": {"mean": gfp, "std": 0.1, "median": gfp}}
        cell.gfp_stats = cell.signal_stats["gfp"]
        agg.add_image(f"/study/Feb 6 CMV m1 G{gain} L1", [cell])
    import os

    paths = agg.save_figures(str(tmp_path))
    assert len(paths) == 2
    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in paths)


def test_cli_study_command(tmp_path, capsys):
    """hcunet study over an analyzed work dir's .cells.npz journals."""
    import json

    from hcunet_tpu.analysis.haircell import HairCell
    from hcunet_tpu.cli import main
    from hcunet_tpu.infer.pipeline import _save_cells

    for gain in (10, 30):
        d = tmp_path / f"Feb 6 CMV m1 G{gain} L1_cellBycell"
        d.mkdir()
        cells = []
        for i in range(3):
            c = HairCell([0, 0, 0, 1, 1, 1], [0, 0, 0], unique_id=i + 1)
            c.signal_stats = {
                "gfp": {"mean": 0.1 * gain + 0.01 * i, "std": 0.1,
                        "median": 0.1 * gain}
            }
            c.gfp_stats = c.signal_stats["gfp"]
            cells.append(c)
        _save_cells(str(d / "chunk_1_1.cells.npz"), cells)

    out = tmp_path / "study"
    rc = main([
        "study",
        str(tmp_path / "Feb 6 CMV m1 G10 L1_cellBycell"),
        str(tmp_path / "Feb 6 CMV m1 G30 L1_cellBycell"),
        "--out", str(out),
    ])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["images"] == 2 and info["cells"] == 6
    assert info["gfp_vs_gain"]["n"] == 6
    assert (out / "study.csv").exists()
    for p in info["figures"]:
        import os

        assert os.path.exists(p)


def test_load_legacy_cells_rejects_dangerous_globals(tmp_path):
    """A crafted all_cells.pkl that smuggles an executable global (e.g.
    ``os.system``) must raise instead of executing on load (ADVICE r2)."""
    import pickle

    import pytest

    from hcunet_tpu.analysis.validate import load_legacy_cells

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("true",))

    p = tmp_path / "all_cells.pkl"
    with open(p, "wb") as f:
        pickle.dump([Evil()], f)
    with pytest.raises(pickle.UnpicklingError, match="refusing to unpickle"):
        load_legacy_cells(str(p))


def test_load_legacy_cells_blocks_nested_torch_load_gadget(tmp_path):
    """torch.storage._load_from_bytes internally runs torch.load — an
    allowlisted entry must not hand attacker bytes to an unrestricted
    nested unpickler (the classic allowlist bypass)."""
    import io
    import pickle

    import pytest
    import torch

    from hcunet_tpu.analysis.validate import load_legacy_cells

    class _Evil:
        def __reduce__(self):
            return (eval, ("__import__('os').getcwd()",))

    evil_torch_bytes = io.BytesIO()
    torch.save({"payload": _Evil()}, evil_torch_bytes)

    class _Carrier:
        def __reduce__(self):
            import torch.storage

            return (torch.storage._load_from_bytes,
                    (evil_torch_bytes.getvalue(),))

    p = tmp_path / "all_cells.pkl"
    with open(p, "wb") as f:
        pickle.dump([_Carrier()], f)
    with pytest.raises(Exception) as ei:
        load_legacy_cells(str(p))
    assert "eval" in str(ei.value) or "Unpickling" in str(
        type(ei.value).__name__
    ) or "Weights only" in str(ei.value) or "weights_only" in str(ei.value)
