"""Generic name -> factory registry.

The reference keeps 16 copy-pasted vertical-slice scripts (one per model,
``/root/reference/Thesis/01_Models/**``); here every model/front-end/loss registers into
a named registry so training/eval drivers are generic.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str, obj: Optional[Callable[..., Any]] = None):
        """Register ``obj`` under ``name``; usable as a decorator."""

        def _do(fn: Callable[..., Any]) -> Callable[..., Any]:
            if name in self._entries:
                raise KeyError(f"{self.kind} registry already has '{name}'")
            self._entries[name] = fn
            return fn

        if obj is not None:
            return _do(obj)
        return _do

    def get(self, name: str) -> Callable[..., Any]:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"unknown {self.kind} '{name}'; known: {known}") from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._entries))

    def names(self):
        return sorted(self._entries)
