"""Typed errors mirroring the reference's `ASError` (src/error.rs:8-56)."""

from __future__ import annotations


class ASError(Exception):
    """Base accumulation-scheme error (reference `ASError` / `BoxedError`)."""


class MalformedAccumulator(ASError):
    """An accumulator is malformed (reference src/error.rs:10-12)."""


class MalformedInput(ASError):
    """An input is malformed (reference src/error.rs:13-15)."""


class MissingAccumulatorsAndInputs(ASError):
    """Nothing to accumulate (reference src/error.rs:16-18)."""


class MissingRng(ASError):
    """Zero-knowledge accumulation requires an rng (reference src/error.rs:19-20)."""
