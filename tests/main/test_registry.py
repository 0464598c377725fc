import dataclasses
from typing import Optional, Tuple

import pytest

from pace_tpu.utils.registry import ConfigError, Registry, from_dict


@dataclasses.dataclass
class Inner:
    a: int = 1
    b: float = 2.0


@dataclasses.dataclass
class Outer:
    name: str
    inner: Inner = dataclasses.field(default_factory=Inner)
    layout: Tuple[int, int] = (1, 1)
    maybe: Optional[Inner] = None


def test_from_dict_nested():
    out = from_dict(
        Outer, {"name": "x", "inner": {"a": 5}, "layout": [2, 3]}
    )
    assert out.inner.a == 5
    assert out.inner.b == 2.0
    assert out.layout == (2, 3)
    assert out.maybe is None


def test_from_dict_strict_unknown_key():
    with pytest.raises(ConfigError):
        from_dict(Outer, {"name": "x", "bogus": 1})


def test_from_dict_int_to_float_cast():
    out = from_dict(Inner, {"b": 3})
    assert isinstance(out.b, float)


def test_registry_roundtrip():
    registry = Registry()

    @registry.register("analytic")
    @dataclasses.dataclass
    class AnalyticInit:
        case: str = "baroclinic"

    obj = registry.from_dict(
        {"type": "analytic", "config": {"case": "tropicalcyclone"}}
    )
    assert obj.case == "tropicalcyclone"
    with pytest.raises(ConfigError):
        registry.from_dict({"type": "nope"})


def test_registry_default_type():
    registry = Registry(default_type="plain")

    @registry.register("plain")
    @dataclasses.dataclass
    class Plain:
        x: int = 0

    assert registry.from_dict({}).x == 0


def test_constants_sets():
    from pace_tpu import constants

    gfdl = constants.get_constants("GFDL")
    gfs = constants.get_constants("GFS")
    assert gfdl.RADIUS != gfs.RADIUS
    assert 0.28 < gfdl.KAPPA < 0.29
    assert gfdl.ZVIR > 0.6
    with pytest.raises(ValueError):
        constants.get_constants("NOPE")
