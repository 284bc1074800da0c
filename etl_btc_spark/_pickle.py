"""Executor-side importability shim.

The driver contract (__spark_entry__.py) loads this package by file
path, so it is NOT on the executors' PYTHONPATH: a pandas UDF that
references ``etl_btc_spark.*`` functions would die with
ModuleNotFoundError in the Python workers. Registering the package's
modules for cloudpickle *pickle-by-value* makes every UDF closure
self-contained — the function graph (code + referenced module
globals) travels inside the serialized task, and workers only need
numpy/pandas from site-packages.

Equivalent to shipping the package via ``sc.addPyFile(zip)``, minus
the filesystem side effects; cost is a few KB per serialized UDF.
Call :func:`ensure_serializable` before constructing any UDF.
"""

from __future__ import annotations

import sys


def ensure_serializable() -> None:
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover
        return
    for name, mod in list(sys.modules.items()):
        if mod is None or not (name == "etl_btc_spark" or name.startswith("etl_btc_spark.")):
            continue
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:  # already registered / not a real module
            pass
