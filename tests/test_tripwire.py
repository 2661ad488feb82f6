"""Change-detection unit tests for tools/bench_tripwire.py (no Spark).

The tripwire's value is exactly its detection precision: miss a
changed query and a regression ships unbenched (the r8 knn defect);
over-widen and every edit re-benches whole modules, burning the
round's bench budget on noise (the r9 sweep re-benched 282 queries
partly through the blank-residue bug pinned here).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from bench_tripwire import (  # noqa: E402
    _imports_from,
    _module_level_code,
    _top_level_funcs,
)


def test_line_shift_inside_function_is_not_module_level_change():
    """Adding lines INSIDE a function must not read as module-level
    code change (it previously shifted the blanked residue and widened
    the edit to the whole module)."""
    old = "X = 1\n\ndef f():\n    return 1\n\ndef g():\n    return 2\n"
    new = "X = 1\n\ndef f():\n    a = 0\n    a += 1\n    return 1\n\ndef g():\n    return 2\n"
    assert _module_level_code(old) == _module_level_code(new)
    funcs_old, funcs_new = _top_level_funcs(old), _top_level_funcs(new)
    assert funcs_old["g"] == funcs_new["g"]
    assert funcs_old["f"] != funcs_new["f"]


def test_module_level_constant_change_is_detected():
    old = "CAP = 64\n\ndef f():\n    return CAP\n"
    new = "CAP = 32\n\ndef f():\n    return CAP\n"
    assert _module_level_code(old) != _module_level_code(new)


def test_decorator_edit_belongs_to_the_function_not_the_module():
    """@query('name', oracle=...) args live in the decorator; an edit
    there must surface as a change to THAT function (so the one query
    re-benches), not as module-level (whole module) and not vanish."""
    old = "@deco('a')\ndef f():\n    return 1\n"
    new = "@deco('b')\ndef f():\n    return 1\n"
    assert _module_level_code(old) == _module_level_code(new)
    assert _top_level_funcs(old)["f"] != _top_level_funcs(new)["f"]


def test_imports_from_sees_nested_and_whole_module_imports():
    src = (
        "import other\n"
        "from free_etl_spark.queries import windows\n"
        "def f():\n"
        "    from free_etl_spark.queries.tpch_more import bought_baskets\n"
        "    return bought_baskets\n"
    )
    names, whole = _imports_from(src, "free_etl_spark.queries.tpch_more")
    assert names == {"bought_baskets"} and not whole
    names, whole = _imports_from(src, "free_etl_spark.queries.windows")
    assert whole
    names, whole = _imports_from(src, "free_etl_spark.queries.dedup")
    assert not names and not whole
