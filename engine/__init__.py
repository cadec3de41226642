"""ray-geo-er: a from-scratch Ray-Data-native geospatial ER / spatial-join engine.

Capabilities mirror BarGenossar/Geospatial-Object-Matching (3dSAGER, reference
snapshot at /root/reference) re-expressed as ray.data.Dataset pipelines; see
SURVEY.md for the operator-by-operator mapping.
"""

import importlib
import pkgutil


def _register_pickle_by_value():
    """Ship our modules by value inside Ray task closures.

    Ray workers don't inherit the driver's sys.path, so a driver that imports
    this package from a non-cwd location (e.g. via sys.path manipulation)
    would otherwise hit ModuleNotFoundError when tasks deserialize.  Module
    sources are a few KB — negligible per-task overhead.
    """
    try:
        from ray import cloudpickle as cp
    except Exception:  # pragma: no cover - ray always present in this env
        return
    for pkg_name in ("engine", "datagen"):
        try:
            pkg = importlib.import_module(pkg_name)
            cp.register_pickle_by_value(pkg)
            for m in pkgutil.iter_modules(pkg.__path__):
                cp.register_pickle_by_value(
                    importlib.import_module(f"{pkg_name}.{m.name}"))
        except Exception:
            pass


_register_pickle_by_value()
