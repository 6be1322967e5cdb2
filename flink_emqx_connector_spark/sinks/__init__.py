"""Sinks: MQTT publisher (the loop the reference never closed — it only has
test/console sinks, SURVEY.md §2.1 S10-S11)."""

from .emqx import foreach_batch_publisher, publish_dataframe

__all__ = ["foreach_batch_publisher", "publish_dataframe"]
