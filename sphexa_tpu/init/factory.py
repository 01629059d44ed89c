"""Initial-condition factory (reference: main/src/init/factory.hpp:44-110).

Named test cases map to builder functions returning
(SimState, Box, SphConfig)."""

from __future__ import annotations

from sphexa_tpu.config import SphConfig

_CASES = {}


def register(name):
    def deco(fn):
        _CASES[name] = fn
        return fn
    return deco


def available_cases():
    _ensure_loaded()
    return sorted(_CASES)


def _ensure_loaded():
    # import side-effect registration
    import sphexa_tpu.init.sedov  # noqa: F401
    from sphexa_tpu.init.sedov import init_sedov
    _CASES.setdefault("sedov", init_sedov)
    try:
        from sphexa_tpu.init.noh import init_noh
        _CASES.setdefault("noh", init_noh)
    except ImportError:
        pass
    try:
        from sphexa_tpu.init.isobaric_cube import init_isobaric_cube
        _CASES.setdefault("isobaric-cube", init_isobaric_cube)
    except ImportError:
        pass
    try:
        from sphexa_tpu.init.gresho_chan import init_gresho_chan
        _CASES.setdefault("gresho-chan", init_gresho_chan)
    except ImportError:
        pass
    try:
        from sphexa_tpu.init.kelvin_helmholtz import init_kelvin_helmholtz
        _CASES.setdefault("kelvin-helmholtz", init_kelvin_helmholtz)
    except ImportError:
        pass
    try:
        from sphexa_tpu.init.wind_shock import init_wind_shock
        _CASES.setdefault("wind-shock", init_wind_shock)
    except ImportError:
        pass
    try:
        from sphexa_tpu.init.evrard import init_evrard
        _CASES.setdefault("evrard", init_evrard)
    except ImportError:
        pass
    try:
        from sphexa_tpu.init.turbulence import init_turbulence
        _CASES.setdefault("turbulence", init_turbulence)
    except ImportError:
        pass


def make_initializer(name: str):
    _ensure_loaded()
    if name not in _CASES:
        raise ValueError(f"unknown test case '{name}'; available: {available_cases()}")
    fn = _CASES[name]

    def build(*args, **kw):
        # every registered lattice/glass case uses one particle mass —
        # enable the equal-mass momentum-kernel fast path (exact there)
        state, box, cfg = fn(*args, **kw)
        return state, box, cfg.replace(uniform_mass=True)

    return build
