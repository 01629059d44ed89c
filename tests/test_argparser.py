"""Front-end argument parsing (reference: main/test/arg_parser.cpp —
strict flag semantics, output-trigger parsing, init-spec splitting)."""

import pytest

from sphexa_tpu.main import _is_output_step, _is_output_time, parse_args
from sphexa_tpu.init.settings import parse_init_spec


def test_defaults():
    a = parse_args(["--init", "sedov"])
    assert a.n == 50 and a.steps == 10 and a.prop == "ve"
    assert a.output_every == "0" and a.sim_time is None
    assert a.fields == "rho,p" and a.split == 1
    assert not a.quiet and not a.ascii and not a.debug_nans


def test_all_flags_roundtrip(tmp_path):
    a = parse_args(["--init", "noh", "-n", "30", "-s", "7",
                    "--sim-time", "0.6", "--prop", "ve-pallas",
                    "-w", "0.05", "--wextra", "10,0.25,20",
                    "--duration", "3600", "-o", str(tmp_path / "d.h5"),
                    "--constants", str(tmp_path / "c.txt"),
                    "--dt0", "1e-5", "--split", "4", "--quiet",
                    "-f", "rho", "--debug-nans"])
    assert a.n == 30 and a.steps == 7 and a.sim_time == 0.6
    assert a.prop == "ve-pallas" and a.output_every == "0.05"
    assert a.wextra == "10,0.25,20" and a.duration == 3600.0
    assert a.dt0 == 1e-5 and a.split == 4 and a.quiet and a.debug_nans


def test_unknown_prop_rejected(capsys):
    with pytest.raises(SystemExit):
        parse_args(["--init", "sedov", "--prop", "nope"])
    assert "invalid choice" in capsys.readouterr().err


def test_init_required(capsys):
    with pytest.raises(SystemExit):
        parse_args([])
    assert "--init" in capsys.readouterr().err


def test_init_spec_parsing():
    """--init accepts a case name, case:settings.h5 layering, or a
    checkpoint path with optional :step (reference factory semantics,
    init/factory.hpp)."""
    assert parse_init_spec("sedov")[0] == "case"
    kind, name, extra = parse_init_spec("dump.sphexa.h5")
    assert kind == "checkpoint" and name == "dump.sphexa.h5"
    kind, name, extra = parse_init_spec("dump.sphexa.h5:3")
    assert kind == "checkpoint" and extra == 3


def test_output_triggers():
    """Integer -w = every N iterations; float -w = every dt of sim time
    (reference isOutputStep/isOutputTime, sphexa.cpp:159-162)."""
    assert _is_output_step(10, "5") and not _is_output_step(11, "5")
    assert not _is_output_step(10, "0")
    # time trigger fires when a multiple of the period is crossed
    assert _is_output_time(0.099, 0.101, "0.05")
    assert not _is_output_time(0.051, 0.074, "0.05")
    # integer spec never time-triggers; float spec never step-triggers
    assert not _is_output_time(0.099, 0.101, "5")
    assert not _is_output_step(10, "0.05")
