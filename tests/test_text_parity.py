"""normalize_text parity vs the reference implementation, loaded as a runtime
oracle: the function source is extracted from /root/reference at test time
(its module can't be imported wholesale — torchaudio isn't in this image) and
executed in an isolated namespace. Skips when the reference isn't mounted."""
import ast
import os
import re

import pytest

from moss_ttsd_tpu.pipeline.text import normalize_text

REF = "/root/reference/generation_utils.py"


@pytest.fixture(scope="module")
def ref_normalize():
    if not os.path.exists(REF):
        pytest.skip("reference tree not mounted")
    with open(REF) as f:
        tree = ast.parse(f.read())
    fns = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "normalize_text", "process_text_remove_punctuation",
                "remove_punctuation"):
            fns[node.name] = node
    assert "normalize_text" in fns
    ns = {"re": re}
    for node in fns.values():
        code = ast.Module(body=[node], type_ignores=[])
        exec(compile(code, REF, "exec"), ns)          # noqa: S102 (test oracle)
    return ns["normalize_text"]


CASES = [
    "[S1]你好！今天怎么样？[S2]很好哈哈哈，谢谢。",
    "[1]带数字标签的句子。[2]第二个说话人！",
    "[S1]Well, hello there! How are you?[S2]Great ha ha, thanks; really.",
    "[S1]多行\n文本（带括号）和【装饰】符号～[S2]结尾没有标点",
    "[S1]重复[S1]同一个说话人的两段。[S2]然后换人。",
    "[S1]English with hahaha laughter and ellipsis…… dashes——done.",
    "[S1]句子只有一个字[S2]好",
    "plain text without any speaker tags at all!",
    "[S1]Mixed 中英文 sentence, with commas、顿号：and colons.",
    "[S1]“引号”和‘单引号’以及\"double quotes\".",
]


@pytest.mark.parametrize("case", CASES)
def test_normalize_matches_reference(ref_normalize, case):
    assert normalize_text(case) == ref_normalize(case)


@pytest.fixture(scope="module")
def ref_fns():
    """Extract pure pipeline functions from the reference as oracles."""
    if not os.path.exists(REF):
        pytest.skip("reference tree not mounted")
    import numpy as np
    import torch
    with open(REF) as f:
        tree = ast.parse(f.read())
    wanted = {"process_jsonl_item", "shifting_inputs", "rpadding",
              "find_max_valid_positions"}
    ns = {"re": re, "os": os, "np": np, "torch": torch}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            exec(compile(ast.Module(body=[node], type_ignores=[]), REF,
                         "exec"), ns)
    return ns


def test_process_jsonl_item_parity(ref_fns):
    from moss_ttsd_tpu.pipeline.jsonl import process_jsonl_item
    items = [
        {"text": "t", "prompt_audio": "a.wav", "prompt_text": "p",
         "base_path": "/b"},
        {"text": "t", "prompt_audio_speaker1": "a1.wav",
         "prompt_text_speaker1": "p1", "prompt_audio_speaker2": "a2.wav",
         "prompt_text_speaker2": "p2", "base_path": "/b"},
        {"text": "only text"},
        {"text": "t", "prompt_audio_speaker1": "a1.wav",
         "prompt_text_speaker1": "p1", "prompt_audio_speaker2": "",
         "prompt_text_speaker2": ""},
    ]
    for item in items:
        assert process_jsonl_item(dict(item)) == \
            ref_fns["process_jsonl_item"](dict(item))


class _Tok:
    pad_token_id = 7


def test_shift_and_padding_parity(ref_fns):
    import numpy as np
    from moss_ttsd_tpu.pipeline.prompt import (left_pad_batch,
                                               shift_delay_pattern)
    rng = np.random.default_rng(0)
    ids_list = [rng.integers(0, 1000, (n, 8)).astype(np.int64)
                for n in (5, 9, 7)]
    ours = [shift_delay_pattern(ids, _Tok.pad_token_id, 1024)
            for ids in ids_list]
    theirs = [ref_fns["shifting_inputs"](ids, _Tok()) for ids in ids_list]
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(a, b)

    batch, mask = left_pad_batch(ours, _Tok.pad_token_id, 1024)
    rbatch, rmask = ref_fns["rpadding"](theirs, 8, _Tok())
    np.testing.assert_array_equal(batch, rbatch.numpy())
    np.testing.assert_array_equal(mask, rmask.numpy())


def test_find_max_valid_positions_parity(ref_fns):
    import numpy as np
    import torch
    from moss_ttsd_tpu.pipeline.prompt import find_max_valid_positions
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 1025, (4, 12, 8)).astype(np.int64)
    arr[1, :, 1] = 1024                        # no valid rows -> -1
    arr[2, 7:, 1] = 1024
    ours = find_max_valid_positions(arr, 1024)
    theirs = ref_fns["find_max_valid_positions"](torch.from_numpy(arr), 1024)
    np.testing.assert_array_equal(np.asarray(ours), theirs.numpy())
