"""Legacy-path shim: all metadata lives in pyproject.toml ([project] table,
PEP 621 — read natively by setuptools >= 61). This file exists so offline
environments without the `wheel` package can still `pip install -e .`
through pip's legacy editable route."""

from setuptools import setup

setup()
