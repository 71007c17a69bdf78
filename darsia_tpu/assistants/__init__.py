"""Assistants (parity: reference ``assistants/``) — headless-first."""

from .base_assistant import BaseAssistant, interactive_available
from .selection_assistants import (
    PointSelectionAssistant,
    BoxSelectionAssistant,
    RectangleSelectionAssistant,
    SubregionAssistant,
    RotationCorrectionAssistant,
)
from .crop_assistant import CropAssistant
from .labels_assistant import (
    LabelsSegmentAssistant,
    LabelsMaskSelectionAssistant,
    LabelsPickAssistant,
    LabelsMergeAssistant,
    LabelsAssistant,
)
