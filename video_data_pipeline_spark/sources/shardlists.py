"""Shard-list expansion (reference ``shardlists.py``).

The reference's shard URL mini-language (``expand_urls``,
shardlists.py:57-86): ``::``-separated specs concatenate; ``${VAR}``
substitutes environment variables; ``{000..123}`` brace ranges expand.
In the Spark engine a shard list is just the ``paths`` argument of a
reader, so these helpers are driver-side and tiny; sampling/striping
operators that consumed shard streams (``split_by_node``,
``ResampledShards``) are subsumed by Spark partitioning and
``operators.sampling``.
"""

from __future__ import annotations

import os
import re

_BRACE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def _expand_braces(url: str) -> list[str]:
    m = _BRACE.search(url)
    if not m:
        return [url]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(_expand_braces(url[: m.start()] + str(i).zfill(width) + url[m.end() :]))
    return out


def expand_urls(urls: str | list[str]) -> list[str]:
    """``"a-{000..009}.tar::b-{00..04}.tar"`` → 15 concrete paths.

    Reference semantics (shardlists.py:57-86): ``::`` concat, ``$VAR`` env
    substitution, numeric brace expansion with zero-padding preserved.
    """
    if isinstance(urls, str):
        specs = urls.split("::")
    else:
        specs = [s for u in urls for s in str(u).split("::")]
    out: list[str] = []
    for spec in specs:
        spec = os.path.expandvars(spec)
        out.extend(_expand_braces(spec))
    return out
