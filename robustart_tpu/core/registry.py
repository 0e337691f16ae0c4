"""Generic name → factory registry used by models, attacks, readers, samplers."""

from __future__ import annotations

from typing import Any, Callable, Iterable, TypeVar

F = TypeVar("F", bound=Callable[..., Any])


class Registry:
    """A simple string-keyed factory registry with decorator registration."""

    def __init__(self, kind: str):
        self.kind = kind
        self._factories: dict[str, Callable[..., Any]] = {}

    def register(self, name: str | Iterable[str]) -> Callable[[F], F]:
        names = [name] if isinstance(name, str) else list(name)

        def deco(fn: F) -> F:
            for n in names:
                if n in self._factories:
                    raise KeyError(f"{self.kind} '{n}' already registered")
                self._factories[n] = fn
            return fn

        return deco

    def __contains__(self, name: str) -> bool:
        return name in self._factories

    def names(self) -> list[str]:
        return sorted(self._factories)

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._factories:
            raise KeyError(
                f"Unknown {self.kind} '{name}'. Available: {self.names()}"
            )
        return self._factories[name]

    def create(self, name: str, *args: Any, **kwargs: Any) -> Any:
        return self.get(name)(*args, **kwargs)
