"""EXAMPLES.md rot check: every import statement shown in the cookbook
must resolve against the real package — a renamed operator or moved
module must fail this test, not a user following the doc."""

import importlib
import os
import re

_DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXAMPLES.md"
)


def _code_blocks():
    text = open(_DOC).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def _import_lines():
    for block in _code_blocks():
        lines = block.splitlines()
        i = 0
        while i < len(lines):
            line = lines[i].strip()
            # join parenthesized multi-line imports into one statement
            if line.startswith("from ") and line.endswith("("):
                parts = [line]
                while not parts[-1].rstrip().endswith(")"):
                    i += 1
                    parts.append(lines[i].strip())
                line = " ".join(parts).replace("(", "").replace(")", "")
            if line.startswith("from ") and " import " in line:
                yield line.rstrip(",")
            elif line.startswith("import "):
                yield line
            i += 1


def test_examples_md_has_code_blocks():
    blocks = _code_blocks()
    assert len(blocks) >= 10, f"expected a cookbook, found {len(blocks)} blocks"


def test_every_cookbook_import_resolves():
    lines = list(_import_lines())
    assert lines, "no import lines found in EXAMPLES.md"
    for line in lines:
        if line.startswith("import "):
            mod = line.split()[1].split(".")[0]
            importlib.import_module(mod)
            continue
        m = re.match(r"from ([\w.]+) import (.+)", line)
        assert m, line
        module_name, names = m.groups()
        module = importlib.import_module(module_name)
        for name in names.split(","):
            name = name.strip().split(" as ")[0]
            if not name:  # trailing comma in a joined multi-line import
                continue
            if hasattr(module, name):
                continue
            try:  # `from pkg import submodule` needs no __init__ re-export
                importlib.import_module(f"{module_name}.{name}")
            except ImportError:
                raise AssertionError(
                    f"EXAMPLES.md imports {name!r} from {module_name}, "
                    "which no longer exposes it"
                )
