"""Render backends subpackage."""
