"""Dynamic stage loading by dotted module path — the rebuild of the
reference's third-party plugin mechanism: any config name that is not a
known alias is ``require``d as an npm module
(/root/reference/bin/logagent.js:226-277 ``loadFilterFunctions`` /
``initPlugins``: ``require(moduleAlias[name] || name)``).

The rebuild keeps the no-eval YAML rule (SURVEY.md §2.9): config never
embeds code, but a name of the form ``"pkg.mod:callable"`` anywhere a
REGISTERED name is accepted today (transforms, filters, config fns)
imports ``pkg.mod`` and resolves ``callable`` on it — the Python
setuptools-entry-point convention, and the exact analogue of the
reference's module-name fallback. The imported attribute must already
exist on an importable module (user code on PYTHONPATH), so the trust
boundary is the Python environment, not the YAML file.

Resolution is cached per path: stages resolve names inside hot
``map_batches`` setup, and every Ray worker process imports the module
once (the same once-per-worker shape as the broadcast-artifact caches).
"""

from __future__ import annotations

import importlib
from typing import Callable

_CACHE: dict[str, Callable] = {}


def is_dotted_path(name) -> bool:
    """``pkg.mod:attr`` — exactly one colon with a non-empty module and
    attribute part. ``$fn:`` config references are NOT dotted paths
    (the config-fn registry owns that prefix)."""
    if not isinstance(name, str) or name.startswith("$fn:"):
        return False
    mod, sep, attr = name.partition(":")
    return bool(sep) and bool(mod) and bool(attr) and ":" not in attr


def load_callable(path: str) -> Callable:
    """Import ``pkg.mod:attr`` (attr may itself be dotted for nested
    attributes, e.g. ``mymod:Hooks.transform``). Raises ImportError /
    AttributeError with the full path named — load failures surface at
    config-resolution time, mirroring the reference's loud
    'Error loading plugin' path (bin/logagent.js:254-263)."""
    fn = _CACHE.get(path)
    if fn is not None:
        return fn
    if not is_dotted_path(path):
        raise ImportError(f"not a module:callable path: {path!r}")
    mod_name, _, attr = path.partition(":")
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as e:
        raise ImportError(
            f"cannot import module {mod_name!r} for dynamic stage "
            f"{path!r}: {e}") from e
    obj = mod
    for part in attr.split("."):
        try:
            obj = getattr(obj, part)
        except AttributeError:
            raise AttributeError(
                f"module {mod_name!r} has no attribute {attr!r} "
                f"(dynamic stage {path!r})") from None
    if not callable(obj):
        raise TypeError(f"dynamic stage {path!r} resolved to "
                        f"non-callable {type(obj).__name__}")
    _CACHE[path] = obj
    return obj
