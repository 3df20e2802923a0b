"""Exceptions for the aggo-spark pipeline compiler."""

from __future__ import annotations


class AggoSparkError(Exception):
    """Base class for all aggo-spark errors."""


class UnsupportedStage(AggoSparkError):
    """Pipeline stage is not (yet) supported by the compiler."""


class UnsupportedExpression(AggoSparkError):
    """Expression operator is not (yet) supported by the compiler."""


class InvalidPipeline(AggoSparkError):
    """Pipeline JSON is malformed."""


class UnknownCollection(AggoSparkError):
    """$lookup / $unionWith referenced a collection that was not registered."""
