"""MQTT topic-filter matching.

The reference relies on the broker for server-side filtering (subscription
``$share/<group>/<filter>``, reference ``EMQXSourceReader.java:103-112``) and
never matches topics client-side. We provide both:

- ``topic_matches_py`` — exact MQTT 3.1.1/5 matching semantics in Python
  (used by the source and by tests),
- ``topic_matches_col`` — the same filter compiled to a JVM-side ``rlike``
  Column, so topic predicates on a decoded DataFrame stay inside
  whole-stage codegen and can prune partitions when topics are a partition
  column.

MQTT rules: ``+`` matches exactly one level, ``#`` (final level only)
matches any suffix including the empty one; filters starting with ``$`` are
not matched by wildcard-leading filters (``$SYS`` convention).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def filter_to_regex(topic_filter: str) -> str:
    """Compile an MQTT topic filter to an anchored regex (string form)."""
    if topic_filter == "#":
        return r"^(?!\$).*$"  # '#' does not match $SYS topics
    parts = topic_filter.split("/")
    out: list[str] = []
    for i, part in enumerate(parts):
        if part == "#":
            if i != len(parts) - 1:
                raise ValueError(f"'#' must be the final level: {topic_filter!r}")
            # matches the parent level itself or any deeper suffix
            if out:
                last = out.pop()
                out.append(f"{last}(/.*)?")
            else:
                out.append(".*")
            return "^" + "/".join(out) + "$"
        elif part == "+":
            guard = r"(?!\$)" if i == 0 else ""
            out.append(guard + r"[^/]*")
        else:
            out.append(re.escape(part))
    return "^" + "/".join(out) + "$"


def topic_matches_py(topic_filter: str, topic: str) -> bool:
    """Exact MQTT topic-filter match (Python side, for the source/tests)."""
    return re.match(filter_to_regex(topic_filter), topic) is not None


def topic_matches_col(topic: Column | str, topic_filter: str) -> Column:
    """JVM-side topic-filter predicate: ``col.rlike(compiled_regex)``."""
    col = F.col(topic) if isinstance(topic, str) else topic
    return col.rlike(filter_to_regex(topic_filter))


def strip_share(topic_filter: str) -> tuple[str | None, str]:
    """Split a ``$share/<group>/<filter>`` subscription into (group, filter).

    Parity with the reference's shared-subscription parallelism model
    (``EMQXSourceReader.java:103``).
    """
    if topic_filter.startswith("$share/"):
        _, group, rest = topic_filter.split("/", 2)
        return group, rest
    return None, topic_filter
