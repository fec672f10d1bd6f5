"""Multimodal column handling (images/audio/video as opaque binary)."""
