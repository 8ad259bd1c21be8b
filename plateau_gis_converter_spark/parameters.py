"""Typed, schema-validated parameters for jobs / sinks / operators.

Reference parity: the reference validates every sink and pipeline option
through a declared key-value schema before the pipeline starts — typed
entries (string / boolean / integer / file-system path), required flags,
per-type validation, string/JSON coercion, and an ALL-errors-at-once
error map (nusamai/src/parameters/mod.rs:31-145). Without this, a bad
zoom range or sampling rate fails deep inside an executor task hours
into a 100 TB job instead of at plan time on the driver.

This is the Python equivalent: declare a ``Schema`` of ``Param`` specs,
then ``schema.resolve(values)`` returns a validated, defaulted dict or
raises ``ParameterError`` carrying EVERY violation (not just the first),
including unknown keys — same error taxonomy as the reference
(RequiredValueNotProvided / InvalidValue / UnknownParameter).
``resolve_strings`` coerces CLI-style string values first, so
spark-submit front-ends (scripts/submit_job.py) validate exactly like
programmatic callers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable


class ParameterError(ValueError):
    """All violations at once: ``errors`` maps key -> message (the
    cross-field rules land under the pseudo-key ``__schema__``)."""

    def __init__(self, errors: dict[str, str]):
        self.errors = dict(errors)
        super().__init__("; ".join(f"{k}: {v}"
                                   for k, v in sorted(self.errors.items())))


_TYPES = ("string", "integer", "float", "boolean", "path")

_TRUE = {"true", "1", "yes"}
_FALSE = {"false", "0", "no"}


@dataclass
class Param:
    """One typed parameter: type + requiredness + bounds/choices."""

    ptype: str = "string"
    description: str = ""
    required: bool = False
    default: Any = None
    min_value: float | int | None = None
    max_value: float | int | None = None
    choices: tuple | None = None
    must_exist: bool = False        # path type: fail if missing

    def __post_init__(self):
        if self.ptype not in _TYPES:
            raise ValueError(f"unknown parameter type {self.ptype!r}")

    def coerce_str(self, s: str) -> Any:
        """CLI string -> typed value (the reference's
        update_value_with_str)."""
        if self.ptype == "integer":
            return int(s, 10)
        if self.ptype == "float":
            return float(s)
        if self.ptype == "boolean":
            low = s.strip().lower()
            if low in _TRUE:
                return True
            if low in _FALSE:
                return False
            raise ValueError(f"not a boolean: {s!r}")
        return s

    def check(self, value: Any) -> str | None:
        """None when valid, else the violation message."""
        if value is None:
            return "required parameter is not provided" if self.required \
                else None
        if self.ptype == "integer":
            if isinstance(value, bool) or not isinstance(value, int):
                return f"expected integer, got {type(value).__name__}"
        elif self.ptype == "float":
            if isinstance(value, bool) or \
                    not isinstance(value, (int, float)):
                return f"expected float, got {type(value).__name__}"
        elif self.ptype == "boolean":
            if not isinstance(value, bool):
                return f"expected boolean, got {type(value).__name__}"
        elif self.ptype in ("string", "path"):
            if not isinstance(value, str):
                return f"expected {self.ptype}, got {type(value).__name__}"
            if self.required and value == "":
                return "required parameter is not provided"
        if self.ptype == "path" and self.must_exist \
                and not os.path.exists(value):
            return f"path does not exist: {value}"
        if self.min_value is not None and value < self.min_value:
            return f"value {value} < minimum {self.min_value}"
        if self.max_value is not None and value > self.max_value:
            return f"value {value} > maximum {self.max_value}"
        if self.choices is not None and value not in self.choices:
            return f"value {value!r} not in {sorted(map(str, self.choices))}"
        return None


@dataclass
class Schema:
    """A named parameter schema plus optional cross-field rules.

    rules: callables ``(resolved: dict) -> str | None`` run only when all
    per-key checks pass; a returned message is reported under
    ``__schema__``."""

    params: dict[str, Param]
    rules: tuple[Callable[[dict], str | None], ...] = field(default=())

    def resolve(self, values: dict[str, Any] | None = None) -> dict:
        values = dict(values or {})
        errors: dict[str, str] = {}
        for key in values:
            if key not in self.params:
                errors[key] = "unknown parameter"
        resolved = {}
        for key, spec in self.params.items():
            v = values.get(key, spec.default)
            msg = spec.check(v)
            if msg is not None:
                errors[key] = msg
            else:
                resolved[key] = v
        if not errors:
            for rule in self.rules:
                msg = rule(resolved)
                if msg is not None:
                    errors["__schema__"] = msg
                    break
        if errors:
            raise ParameterError(errors)
        return resolved

    def resolve_strings(self, strings: dict[str, str]) -> dict:
        """CLI front-end path: coerce string values per declared type
        (collecting coercion failures), then resolve."""
        values: dict[str, Any] = {}
        errors: dict[str, str] = {}
        for key, s in strings.items():
            spec = self.params.get(key)
            if spec is None:
                errors[key] = "unknown parameter"
                continue
            try:
                values[key] = spec.coerce_str(s)
            except ValueError as e:
                errors[key] = str(e)
        if errors:
            raise ParameterError(errors)
        return self.resolve(values)


# ---------------------------------------------------------------------------
# Engine schemas (validated at plan time by their operators / the submit
# front-end)
# ---------------------------------------------------------------------------

ZOOM_RANGE = Schema(
    params={
        "min_z": Param("integer", "lowest tile zoom", required=True,
                       min_value=0, max_value=24),
        "max_z": Param("integer", "highest tile zoom", required=True,
                       min_value=0, max_value=24),
    },
    rules=(lambda p: (f"min_z {p['min_z']} > max_z {p['max_z']}"
                      if p["min_z"] > p["max_z"] else None),),
)

PACKING = Schema(params={
    "budget": Param("integer", "tokens per packed chunk", required=True,
                    min_value=1),
})

SAMPLING_RATE = Schema(params={
    "rate_ppm": Param("integer", "keep rate in parts-per-million",
                      required=True, min_value=0, max_value=1_000_000),
})


def validate_rates_ppm(rates_ppm: dict) -> dict:
    """Per-stratum ppm map: every value validated against SAMPLING_RATE;
    all violations reported together, keyed by stratum."""
    errors: dict[str, str] = {}
    for stratum, rate in dict(rates_ppm).items():
        try:
            SAMPLING_RATE.resolve({"rate_ppm": rate})
        except ParameterError as e:
            errors[str(stratum)] = e.errors.get("rate_ppm", str(e))
    if errors:
        raise ParameterError(errors)
    return dict(rates_ppm)


SUBMIT_JOB = Schema(
    params={
        "sf_dir": Param("path", "scale-factor data dir", required=True,
                        must_exist=True),
        "job": Param("string", "job name", required=True,
                     choices=("spatial_join", "tile_assign")),
        "out": Param("string", "output root", required=True),
        "shuffle_partitions": Param("integer", "spark.sql.shuffle."
                                    "partitions", default=32, min_value=1,
                                    max_value=1_000_000),
    },
)
