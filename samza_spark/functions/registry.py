"""UDF registry — the ScalarUdf / @SamzaSqlUdf analog.

Reference: /root/reference samza-api/.../sql/udfs/ScalarUdf.java:34,
SamzaSqlUdf.java:33, SamzaSqlUdfMethod.java:34-45 (polymorphic + vararg
methods), resolved via ConfigBasedUdfResolver / ReflectionBasedUdfResolver
and bound to Calcite in SamzaSqlScalarFunctionImpl.java.

Spark mapping: ``spark.udf.register`` with either a plain Python UDF or an
Arrow-vectorised pandas UDF. Samza has no UDAF/UDTF (SURVEY.md §2.5) — we
accept pandas-aggregate registration as an extension flag.

Overloads: ``@SamzaSqlUdfMethod`` lets one UDF name carry several methods
with different parameter lists (polymorphism + varargs, resolved
reflectively per call). Spark binds one callable per name, so a name with
multiple registered signatures is attached as a single dispatching UDF
that picks the signature by argument count and runtime types — the
row-at-a-time path, like the reference's reflective dispatch. All
signatures of a name must agree on the return type (a Spark constraint;
the reference's Calcite binding is looser but its shipped UDFs agree
too).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# runtime type tags for dispatch — SQL nulls (None) match any tag
_TYPE_CHECKS = {
    "int": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "long": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "double": lambda v: isinstance(v, float),
    "float": lambda v: isinstance(v, float),
    "string": lambda v: isinstance(v, str),
    "bool": lambda v: isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "binary": lambda v: isinstance(v, (bytes, bytearray)),
    "array": lambda v: isinstance(v, (list, tuple)),
    "map": lambda v: isinstance(v, dict),
    "any": lambda v: True,
}


@dataclass
class UdfSignature:
    """One overload of a UDF name (the @SamzaSqlUdfMethod analog)."""

    fn: Callable
    params: tuple | None = None  # type tags; None = infer arity from fn
    varargs: bool = False

    def __post_init__(self):
        if self.params is None:
            sig = inspect.signature(self.fn)
            ps = list(sig.parameters.values())
            if ps and ps[-1].kind is inspect.Parameter.VAR_POSITIONAL:
                self.varargs = True
                ps = ps[:-1]
            self.params = tuple("any" for _ in ps)
        bad = [t for t in self.params if t not in _TYPE_CHECKS]
        if bad:
            raise ValueError(f"unknown param type tags {bad}; known: {sorted(_TYPE_CHECKS)}")

    def matches(self, args: tuple) -> bool:
        if self.varargs:
            if len(args) < len(self.params):
                return False
            pairs = zip(self.params, args[: len(self.params)])
        else:
            if len(args) != len(self.params):
                return False
            pairs = zip(self.params, args)
        return all(v is None or _TYPE_CHECKS[t](v) for t, v in pairs)


@dataclass
class UdfSpec:
    name: str
    return_type: object  # DataType or DDL string
    vectorized: bool = True  # pandas UDF (Arrow) vs row-at-a-time
    signatures: list = field(default_factory=list)

    @property
    def fn(self) -> Callable:  # single-signature convenience (back-compat)
        return self.signatures[0].fn


def _make_dispatcher(spec: UdfSpec) -> Callable:
    sigs = list(spec.signatures)

    def dispatch(*args):
        for s in sigs:
            if s.matches(args):
                return s.fn(*args)
        raise TypeError(
            f"UDF {spec.name!r}: no overload matches "
            f"({', '.join(type(a).__name__ for a in args)}); "
            f"registered: {[s.params + (('...',) if s.varargs else ()) for s in sigs]}"
        )

    return dispatch


@dataclass
class UdfRegistry:
    """Registers scalar functions with a SparkSession so both the DSL and
    the SQL surface (spark.sql) can call them by name."""

    udfs: dict = field(default_factory=dict)

    def register(
        self,
        name: str,
        fn: Callable,
        return_type,
        vectorized: bool = True,
        params: Sequence[str] | None = None,
        varargs: bool = False,
    ) -> "UdfRegistry":
        """Register ``fn`` under ``name``. Calling again with the same name
        ADDS an overload (dispatch on arg count + runtime types, reference
        SamzaSqlUdfMethod.java:34-45); all overloads of a name must share
        ``return_type``."""
        sig = UdfSignature(fn, tuple(params) if params is not None else None, varargs)
        spec = self.udfs.get(name)
        if spec is None:
            self.udfs[name] = UdfSpec(name, return_type, vectorized, [sig])
        else:
            if str(spec.return_type) != str(return_type):
                raise ValueError(
                    f"overload of {name!r} changes return type "
                    f"({spec.return_type!r} -> {return_type!r}); Spark binds one "
                    "return type per function name"
                )
            spec.signatures.append(sig)
        return self

    def attach(self, spark: SparkSession) -> None:
        for spec in self.udfs.values():
            if len(spec.signatures) > 1:
                # polymorphic/vararg name: one dispatching row-at-a-time UDF
                spark.udf.register(
                    spec.name, _make_dispatcher(spec), spec.return_type
                )
            elif spec.signatures[0].varargs:
                spark.udf.register(spec.name, spec.fn, spec.return_type)
            elif spec.vectorized:
                spark.udf.register(spec.name, F.pandas_udf(spec.fn, spec.return_type))
            else:
                spark.udf.register(spec.name, spec.fn, spec.return_type)

    def names(self) -> list:
        return sorted(self.udfs)
