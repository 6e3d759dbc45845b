"""Structured Streaming surface: the CDC pipeline runner, event-time
windowing, and custom stateful operators."""
