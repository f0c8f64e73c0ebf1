"""Execute the README quick-start verbatim — the analogue of the
reference's README doc-test (lib.rs:12 includes README.md, so its example
compiles and runs in `cargo test`)."""

import os
import re


def test_readme_quickstart_executes():
    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as f:
        text = f.read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert blocks, "README must contain a python quick-start block"
    exec(compile(blocks[0], "README.md#quickstart", "exec"), {"__name__": "readme"})
