"""Static guard for the worker-import failure class.

The package ships to Ray workers BY VALUE (cloudpickle registration in
``sanskrit_ocr_ray/__init__.py``), so workers cannot import
``sanskrit_ocr_ray`` by name. A relative import executed INSIDE a
nested function (a map_batches closure) therefore raises
ModuleNotFoundError on workers in the driver context — while pytest
masks it, because the test session's driver has the repo on sys.path
before ray.init. Round 5 hit exactly this; this test pins the rule:

    relative imports may appear at module level or in the body of a
    TOP-LEVEL function (which runs driver-side and lets closures
    capture the symbols) — never inside a nested function.
"""
import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sanskrit_ocr_ray"
)


def _nested_relative_imports(tree: ast.AST):
    hits = []

    def walk(node, func_depth):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                walk(child, func_depth + 1)
            else:
                if (
                    isinstance(child, ast.ImportFrom)
                    and child.level > 0
                    and func_depth >= 2
                ):
                    hits.append(child.lineno)
                walk(child, func_depth)

    walk(tree, 0)
    return hits


def test_no_relative_imports_in_nested_functions():
    bad = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path) as fh:
                tree = ast.parse(fh.read())
            for lineno in _nested_relative_imports(tree):
                bad.append(f"{os.path.relpath(path, PKG)}:{lineno}")
    assert not bad, (
        "relative import inside a nested function (worker closure) — "
        "move it to module level or the enclosing top-level function "
        "body so Ray workers (package-by-value, no sys.path) never "
        f"execute it: {bad}"
    )


def test_entry_closures_do_not_import_the_package():
    """Same failure class in __ray_entry__.py: its map closures also
    ship by value, so a `sanskrit_ocr_ray` import INSIDE a nested
    function would raise on workers (the driver imports must happen in
    the enclosing top-level function body — see _multimodal_features'
    'imported HERE (driver side)' comment)."""
    path = os.path.join(os.path.dirname(PKG), "__ray_entry__.py")
    with open(path) as fh:
        tree = ast.parse(fh.read())
    bad = []

    def walk(node, func_depth):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                walk(child, func_depth + 1)
            else:
                names = []
                if isinstance(child, ast.ImportFrom) and child.module:
                    names = [child.module]
                elif isinstance(child, ast.Import):
                    names = [a.name for a in child.names]
                if func_depth >= 2 and any(
                    n.split(".")[0] == "sanskrit_ocr_ray" for n in names
                ):
                    bad.append(child.lineno)
                walk(child, func_depth)

    walk(tree, 0)
    assert not bad, f"__ray_entry__.py package import in nested function: {bad}"
