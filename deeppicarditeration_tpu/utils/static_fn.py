"""Hashable function wrapper for static (treedef) fields.

Solution/network pytrees carry callables (e.g. the equation's terminal
function) as static fields. jit requires static fields to be hashable and
comparable; bound methods of array-carrying equation dataclasses are not.
``StaticFn`` gives a callable an identity token so treedef equality and the
jit cache work, while the wrapped closure's array values are traced in as
constants.
"""

from __future__ import annotations

from typing import Any, Callable


class StaticFn:
    __slots__ = ("fn", "token")

    def __init__(self, fn: Callable, token: Any):
        self.fn = fn
        self.token = token

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)

    def __hash__(self):
        return hash(self.token)

    def __eq__(self, other):
        return isinstance(other, StaticFn) and self.token == other.token

    def __repr__(self):
        return f"StaticFn({self.token!r})"
