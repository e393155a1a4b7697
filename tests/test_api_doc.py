"""docs/API.md is executable documentation: every ```python block runs
top-to-bottom in one namespace at the tiny scale it shows. A doc drift
(renamed symbol, changed signature, wrong attribute) fails here instead of
rotting in prose."""

import os
import re


def test_api_doc_blocks_execute(tmp_path, monkeypatch):
    doc = os.path.join(os.path.dirname(__file__), "..", "docs", "API.md")
    with open(doc) as f:
        text = f.read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.DOTALL)
    assert len(blocks) >= 7, "API.md lost its code blocks"
    # relative checkpoint/cache paths in the doc land in a temp cwd
    monkeypatch.chdir(tmp_path)
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"docs/API.md[block {i}]", "exec"), ns)
        except Exception as e:           # pragma: no cover - failure path
            raise AssertionError(
                f"docs/API.md block {i} failed: {e}\n---\n{block}") from e
    # the doc's own asserts ran; spot-check the pipeline actually happened
    assert ns["bank"].num_rows == ns["train_ds"].num_clips
    assert ns["result"].preds.shape == (ns["val_ds"].num_clips,)
    assert ns["report"].mean_accuracy == 100.0
