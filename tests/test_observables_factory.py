"""Settings-keyed observables factory (reference:
main/src/observables/factory.hpp:48-66) — selection unit tests plus an
end-to-end CLI run asserting the case column lands in constants.txt."""

import numpy as np
import pytest

from sphexa_tpu.observables.factory import (GravWaveObs, TimeEnergyGrowthObs,
                                            TimeEnergyObs, TurbMachObs,
                                            WindBubbleObs, make_observables)


def test_selection_order_matches_reference():
    assert isinstance(make_observables("sedov"), TimeEnergyObs)
    assert isinstance(make_observables("turbulence"), TurbMachObs)
    assert isinstance(make_observables("kelvin-helmholtz"),
                      TimeEnergyGrowthObs)
    assert isinstance(make_observables("wind-shock"), WindBubbleObs)
    # observeGravWaves wins over everything (factory.hpp:48)
    obs = make_observables("turbulence", {"observeGravWaves": 1.0,
                                          "gravWaveTheta": 0.1,
                                          "gravWavePhi": 0.2})
    assert isinstance(obs, GravWaveObs)
    with pytest.raises(ValueError):   # factory.hpp:50-54 throws
        make_observables(None, {"observeGravWaves": 1.0})


def test_headers_name_extra_columns():
    assert make_observables("sedov").header().startswith("# iteration")
    assert "machRMS" in make_observables("turbulence").header()
    assert "khGrowthRate" in make_observables("kelvin-helmholtz").header()
    assert "bubbleFraction" in make_observables("wind-shock").header()


def test_turbulence_cli_writes_mach_column(tmp_path):
    """`--init turbulence` -> machRMS per step in constants.txt
    (VERDICT round-2 acceptance for the observables factory)."""
    from sphexa_tpu.main import main

    cpath = str(tmp_path / "constants.txt")
    main(["--init", "turbulence", "-n", "10", "-s", "2",
          "--constants", cpath, "--quiet"])
    lines = open(cpath).read().strip().splitlines()
    assert lines[0].startswith("#") and "machRMS" in lines[0]
    data = [ln.split() for ln in lines if not ln.startswith("#")]
    assert len(data) == 2
    ncols = len(lines[0].lstrip("# ").split())
    assert all(len(row) == ncols for row in data)
    mach = float(data[-1][-1])
    assert np.isfinite(mach) and mach >= 0.0


def test_gravwave_obs_columns(tmp_path):
    """GW strain columns from the Press-2 reconstructed accelerations
    via the CLI settings path (reference: gravitational_waves.hpp)."""
    import h5py

    from sphexa_tpu.main import main

    spath = str(tmp_path / "settings.h5")
    with h5py.File(spath, "w") as f:
        f.attrs["observeGravWaves"] = 1.0
        f.attrs["gravWaveTheta"] = 0.7
        f.attrs["gravWavePhi"] = 0.3
    cpath = str(tmp_path / "constants.txt")
    main(["--init", f"sedov:{spath}", "-n", "8", "-s", "2",
          "--constants", cpath, "--quiet"])
    lines = open(cpath).read().strip().splitlines()
    assert "httplus" in lines[0] and "httcross" in lines[0]
    last = [float(v) for v in lines[-1].split()]
    assert all(np.isfinite(v) for v in last)
