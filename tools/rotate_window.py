#!/usr/bin/env python
"""Rotate ``registry._GRADED_WINDOW`` to ``registry.proposed_window(50)``
— the whole per-round rotation as one idempotent command.

Usage: python tools/rotate_window.py [--check]

``--check`` only reports whether the committed tuple already equals the
proposed window (exit 0) or is stale (exit 1, prints the diff heads);
without it, the tuple literal in ``spark_ml_spark/registry.py`` is
rewritten in place. The doc note above the tuple is NOT touched — update
the r{N} WINDOW prose by hand (it carries round context a script can't
know). After rewriting: pre-audit the new window via

    python tools/driver_check.py /root/testdata/sf0.01 $(python - <<'PY'
    from spark_ml_spark.registry import collect, _GRADED_WINDOW
    collect(); print(" ".join(_GRADED_WINDOW))
    PY
    )

then run pytest (the window tests re-pin the tuple) and commit.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_ml_spark import registry  # noqa: E402

REGISTRY_PATH = os.path.join(REPO, "spark_ml_spark", "registry.py")


def rewrite_tuple(src: str, names: list[str]) -> str:
    """Replace the ``_GRADED_WINDOW`` tuple literal's name entries with
    ``names``, preserving any leading comment lines inside the tuple.
    Raises ValueError if the literal isn't found exactly once."""
    body = "\n".join(f'    "{n}",' for n in names)
    new_src, n_subs = re.subn(
        r"(_GRADED_WINDOW = \(\n(?:    #[^\n]*\n)*)(?:    \"q_\w+\",\n)+\)",
        lambda m: m.group(1) + body + "\n)",
        src,
        count=1,
    )
    if n_subs != 1:
        raise ValueError("could not locate the _GRADED_WINDOW tuple literal")
    return new_src


def main() -> None:
    check_only = "--check" in sys.argv[1:]
    proposed = registry.proposed_window(50)  # collect()s internally
    if not proposed:
        sys.exit("no queries registered — nothing to rotate")
    current = list(registry._GRADED_WINDOW)
    if current == proposed:
        print(f"window is current ({len(proposed)} names, "
              f"head: {proposed[0]})")
        return
    if check_only:
        print("window is STALE:")
        print(f"  current head:  {current[:3]}")
        print(f"  proposed head: {proposed[:3]}")
        sys.exit(1)
    src = open(REGISTRY_PATH).read()
    try:
        new_src = rewrite_tuple(src, proposed)
    except ValueError as e:
        sys.exit(str(e))
    open(REGISTRY_PATH, "w").write(new_src)
    print(f"rotated: {len(proposed)} names, head {proposed[:3]} "
          f"(was {current[:3]})")
    print("next: update the r{N} WINDOW doc note, pre-audit via "
          "tools/driver_check.py, run pytest, commit")


if __name__ == "__main__":
    main()
