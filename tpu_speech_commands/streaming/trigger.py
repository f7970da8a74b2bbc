"""TriggerDetector — debounced activation state machine.

Re-implementation of the reference detector (`listen.py:525-559`): a chunk
is "activated" when its decoded score exceeds `sensitivity`; consecutive
activated chunks of the same non-background class increment a counter;
crossing `trigger_level` fires an activation and enters a refractory period
of -(8*2048)//chunk_size chunks; otherwise the counter decays toward zero.
"""
from __future__ import annotations


class TriggerDetector:
    def __init__(
        self,
        chunk_size: int,
        class_names: list[str],
        sensitivity: float = 0.5,
        trigger_level: int = 3,
    ):
        self.chunk_size = chunk_size
        self.class_names = class_names
        self.sensitivity = sensitivity
        self.trigger_level = trigger_level
        self.activation = 0
        self.record_index: int | None = None

    def update(self, index: int, score: float) -> bool:
        """Feed one prediction; returns whether it caused an activation."""
        chunk_activated = score > self.sensitivity

        if (
            self.class_names[index] != "background"
            and index == self.record_index
            and chunk_activated
        ):
            self.activation += 1
            if self.activation > self.trigger_level:
                # refractory period before the next possible trigger
                self.activation = -(8 * 2048) // self.chunk_size
                self.record_index = index
                return True
        elif self.activation < 0:
            self.activation += 1
        elif self.activation > 0:
            self.activation -= 1

        self.record_index = index
        return False

    def reset(self):
        self.activation = 0
        self.record_index = None
