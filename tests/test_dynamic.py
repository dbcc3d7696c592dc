"""Dynamic ``module:callable`` stage loading (functions/dynamic.py) —
the rebuild of the reference's require-by-module-name plugin fallback
(bin/logagent.js:226-277)."""

import sys
import textwrap

import pyarrow as pa
import pytest

from logagent_js_ray.functions.dynamic import is_dotted_path, load_callable


@pytest.fixture()
def user_module(tmp_path, monkeypatch):
    mod = tmp_path / "la_user_stage.py"
    mod.write_text(textwrap.dedent("""
        import pyarrow.compute as pc

        def shout(cols):
            cols["message"] = pc.utf8_upper(cols["message"])

        def keep_long(cols):
            return pc.greater(pc.utf8_length(cols["message"]), 3)

        class Hooks:
            @staticmethod
            def sinkname(batch):
                return "user-sink"

        not_callable = 42
    """))
    monkeypatch.syspath_prepend(str(tmp_path))
    yield "la_user_stage"
    sys.modules.pop("la_user_stage", None)


def test_is_dotted_path():
    assert is_dotted_path("mymod:fn")
    assert is_dotted_path("pkg.sub:Cls.method")
    assert not is_dotted_path("access_log")          # plain registry name
    assert not is_dotted_path("$fn:index_by_severity")
    assert not is_dotted_path(":fn")
    assert not is_dotted_path("mod:")
    assert not is_dotted_path(None)


def test_load_callable_and_cache(user_module):
    fn = load_callable(f"{user_module}:shout")
    cols = {"message": pa.array(["hi there"])}
    fn(cols)
    assert cols["message"].to_pylist() == ["HI THERE"]
    assert load_callable(f"{user_module}:shout") is fn  # cached
    # nested attribute resolution
    hooks = load_callable(f"{user_module}:Hooks.sinkname")
    assert hooks(None) == "user-sink"


def test_load_callable_errors(user_module):
    with pytest.raises(ImportError, match="no_such_module"):
        load_callable("no_such_module:fn")
    with pytest.raises(AttributeError, match="nope"):
        load_callable(f"{user_module}:nope")
    with pytest.raises(TypeError, match="non-callable"):
        load_callable(f"{user_module}:not_callable")


def test_transform_registry_fallback(user_module):
    """A dotted path works anywhere a registered transform name does."""
    from logagent_js_ray.functions.transforms import get_transform
    fn = get_transform(f"{user_module}:shout")
    cols = {"message": pa.array(["abc"])}
    fn(cols)
    assert cols["message"].to_pylist() == ["ABC"]
    # registered names still win and unknown plain names still raise
    with pytest.raises(KeyError):
        get_transform("definitely_not_registered")


def test_filter_registry_fallback(user_module):
    from logagent_js_ray.functions.transforms import get_filter
    fn = get_filter(f"{user_module}:keep_long")
    mask = fn({"message": pa.array(["hi", "long enough"])})
    assert mask.to_pylist() == [False, True]


def test_config_fn_fallback(user_module):
    """``$fn:pkg.mod:attr`` resolves through the dynamic loader when the
    name is not in the config-fn registry."""
    from logagent_js_ray.functions.config_fns import resolve_config_value
    fn = resolve_config_value(f"$fn:{user_module}:Hooks.sinkname")
    assert fn(None) == "user-sink"
    # registry names unaffected
    assert callable(resolve_config_value("$fn:index_by_severity"))
    with pytest.raises(KeyError):
        resolve_config_value("$fn:unknown_name")
