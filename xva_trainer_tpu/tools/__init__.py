"""Dataset-prep tool suite — the reference's 16 tools (SURVEY.md §2.5),
keyed exactly as python/models_manager.py registers them."""
from .base import BaseTool
from .audio_tools import (
    AudioFormatTool,
    AudioNormalizeTool,
    SilenceCutTool,
    SilenceSplitTool,
    CutPaddingTool,
    NoiseRemovalTool,
    SrtSplitTool,
    Wem2OggTool,
)
from .speaker_tools import (
    ClusterSpeakersTool,
    DiarizationTool,
    SpeakerSearchTool,
    SpeakerClusterSearchTool,
)
from .text_tools import (
    TranscribeTool,
    WerEvaluationTool,
    MakeSrtTool,
    SourceSeparationTool,
    wer,
)

# Tool-key registry (reference python/models_manager.py:31-95)
TOOL_REGISTRY = {
    "formatting": AudioFormatTool,
    "normalize": AudioNormalizeTool,
    "ass": SourceSeparationTool,
    "diarization": DiarizationTool,
    "wem2ogg": Wem2OggTool,
    "cluster_speakers": ClusterSpeakersTool,
    "speaker_search": SpeakerSearchTool,
    "speaker_cluster_search": SpeakerClusterSearchTool,
    "transcribe": TranscribeTool,
    "wer_evaluation": WerEvaluationTool,
    "silence_cut": SilenceCutTool,
    "noise_removal": NoiseRemovalTool,
    "silence_split": SilenceSplitTool,
    "cut_padding": CutPaddingTool,
    "srt_split": SrtSplitTool,
    "make_srt": MakeSrtTool,
}
