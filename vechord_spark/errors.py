"""Engine exceptions (parity with reference error surface).

Reference: vechord/errors.py — the reference raises psycopg
``UniqueViolation`` on duplicate unique-index inserts and ValueError on
schema misuse; we mirror the semantics with engine-level exceptions.
"""


class VechordError(Exception):
    """Base class for engine errors."""


class SchemaError(VechordError):
    """Invalid table/column declaration."""


class UniqueViolation(VechordError):
    """An append would duplicate a value in a UNIQUE-indexed column.

    Reference: vechord/client.py:146-156 (unique index DDL) and
    tests/test_table.py:142-151 (duplicate insert raises).
    """


class TableNotFound(VechordError):
    """Operation against a table that was never created in this namespace."""


class DimensionMismatch(VechordError):
    """A vector value's length does not match the declared Vector[dim].

    Reference: vechord/spec.py:86-132 (shape validation on ingest).
    """
