"""Scenario configuration: TOML config, environment YAML, formation YAML."""

from magics_tpu.config.schema import Config
from magics_tpu.config.formation import FormationGroup
from magics_tpu.env.model import Environment

__all__ = ["Config", "FormationGroup", "Environment"]
