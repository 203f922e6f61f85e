"""Shared query/oracle registry for the driver contract.

Every domain module under ``jsons_to_schema_spark/queries/`` registers its
entries here via the ``@query`` decorator; ``__init__.py`` imports the
domain modules in a fixed order and then applies the driver-window
reordering, so the dict insertion order the driver sees is deterministic."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
