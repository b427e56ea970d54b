"""Reusable GUI widgets (reference: optiland_gui/widgets/)."""
