"""Observability: structured trial/event logging."""

from .log import EventLog, read_events

__all__ = ["EventLog", "read_events"]
