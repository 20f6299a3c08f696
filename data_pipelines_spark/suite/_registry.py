"""Tiny per-module query/oracle registry decorator."""

from __future__ import annotations


def make_registry():
    queries: dict = {}
    oracles: dict = {}

    def register(name: str, oracle: str | None = None):
        def deco(fn):
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, register
