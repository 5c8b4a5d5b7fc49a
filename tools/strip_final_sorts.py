"""Strip trailing presentational ``.orderBy(...)`` calls from
registered query builders — the r15 §2.4 sort sweep (applied then to
the 14 bench-basket queries) finished registry-wide (r16, the r15
verdict's task 6). The driver's correctness gate hashes
order-insensitively by its own definition, so a FINAL global sort buys
nothing and costs an ``Exchange rangepartitioning`` over the entire
result set — at 100 TB, a full-output shuffle.

AST-based and deliberately narrow: only a ``return`` statement inside
a function decorated with ``@query(...)`` whose OUTERMOST expression
is a ``.orderBy(...)`` call is rewritten (the call is removed, the
base expression kept). Semantic sorts are structurally exempt:
``.orderBy(...).limit(n)`` has ``limit`` outermost, window/positional
sorts live inside the plan, and any ordering that materializes into a
COLUMN is not a trailing call. Run with --apply to edit in place;
default is a dry-run report.

    python tools/strip_final_sorts.py [--apply] [files...]
"""

from __future__ import annotations

import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = os.path.join(
    REPO, "financial_data_warehouse_automation_spark", "queries"
)

_SUFFIX_RE = re.compile(r"^\s*\.\s*orderBy\s*\(.*\)\s*$", re.DOTALL)


def _is_query_decorated(fn: ast.FunctionDef) -> bool:
    for dec in fn.decorator_list:
        target = dec.func if isinstance(dec, ast.Call) else dec
        if isinstance(target, ast.Name) and target.id == "query":
            return True
    return False


def _offset(lines: list[str], lineno: int, col: int) -> int:
    return sum(len(l) for l in lines[: lineno - 1]) + col


def process(path: str, apply: bool) -> int:
    src = open(path).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    spans: list[tuple[int, int, str, int]] = []
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef) or not _is_query_decorated(
            node
        ):
            continue
        for ret in ast.walk(node):
            if not isinstance(ret, ast.Return) or ret.value is None:
                continue
            call = ret.value
            if not (
                isinstance(call, ast.Call)
                and isinstance(call.func, ast.Attribute)
                and call.func.attr == "orderBy"
            ):
                continue
            base = call.func.value
            start = _offset(lines, base.end_lineno, base.end_col_offset)
            end = _offset(lines, call.end_lineno, call.end_col_offset)
            suffix = src[start:end]
            if not _SUFFIX_RE.match(suffix):
                print(f"SKIP {path}:{ret.lineno} {node.name}: suffix "
                      f"does not match, {suffix[:60]!r}")
                continue
            spans.append((start, end, node.name, ret.lineno))
    if not spans:
        return 0
    for start, end, name, lineno in spans:
        print(f"{'STRIP' if apply else 'WOULD'} "
              f"{os.path.basename(path)}:{lineno} {name}")
    if apply:
        out = []
        pos = 0
        for start, end, _, _ in sorted(spans):
            out.append(src[pos:start])
            pos = end
        out.append(src[pos:])
        new_src = "".join(out)
        ast.parse(new_src)  # refuse to write anything unparsable
        with open(path, "w") as f:
            f.write(new_src)
    return len(spans)


def main() -> None:
    argv = sys.argv[1:]
    apply = "--apply" in argv
    if apply:
        argv.remove("--apply")
    files = argv or sorted(
        os.path.join(QUERIES, f)
        for f in os.listdir(QUERIES)
        if f.endswith(".py")
    )
    total = 0
    for path in files:
        total += process(path, apply)
    print(f"\n{total} trailing orderBy calls "
          f"{'stripped' if apply else 'found'}")


if __name__ == "__main__":
    main()
