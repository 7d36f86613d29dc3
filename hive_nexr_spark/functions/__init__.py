"""Hive function-surface parity layer.

~95% of the reference's scalar registry (`exec/FunctionRegistry.java`,
SURVEY §2.9) is a same-name Spark builtin; this package supplies the rest as
Column-expression builders that stay JVM-side (whole-stage codegen) instead
of Python UDFs wherever the semantics allow.
"""

from .hive_compat import (  # noqa: F401
    create_union,
    elt,
    field,
    hive_hash,
    register_all,
)
