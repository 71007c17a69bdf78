"""Workflow analysis steps (parity: reference
``presets/workflows/analysis/``)."""

from .expert_knowledge import ExpertKnowledgeAdapter
