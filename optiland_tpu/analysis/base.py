"""Base analysis class (reference: optiland/analysis/base.py:20-60)."""

from __future__ import annotations


class BaseAnalysis:
    """Resolves fields/wavelengths and triggers data generation on init."""

    def __init__(self, optic, wavelengths="all"):
        self.optic = optic
        if wavelengths == "all":
            wavelengths = optic.wavelengths.get_wavelengths()
        elif wavelengths == "primary":
            wavelengths = [optic.primary_wavelength]
        self.wavelengths = wavelengths
        self.data = self._generate_data()

    def _generate_data(self):
        raise NotImplementedError

    def view(self, **kwargs):
        raise NotImplementedError
