"""Connector machinery: the EMQX/MQTT Structured Streaming source (parity
with the reference's EMQXSource/EMQXSourceReader/EMQXSplitEnumerator) and
its pluggable transports."""

from .emqx import EMQXDataSource, register_emqx_source

__all__ = ["EMQXDataSource", "register_emqx_source"]
