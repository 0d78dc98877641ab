"""TimingInfo (maps gemma/gemma.h:169-229): prefill tok/s, TTFT, decode tok/s."""

from __future__ import annotations

import dataclasses
import time


@dataclasses.dataclass
class TimingInfo:
    verbosity: int = 0
    prefill_start: float = 0.0
    generate_start: float = 0.0
    prefill_tokens: int = 0
    generated_tokens: int = 0
    time_to_first_token: float = 0.0
    prefill_duration: float = 0.0
    generate_duration: float = 0.0

    def notify_prefill(self, tokens: int) -> None:
        self.prefill_duration = time.monotonic() - self.prefill_start
        self.prefill_tokens = tokens

    def notify_generated(self, num: int = 1) -> None:
        if self.generated_tokens == 0:
            self.time_to_first_token = time.monotonic() - self.prefill_start
            if self.verbosity >= 1:
                prefill_tps = self.prefill_tokens / max(self.prefill_duration, 1e-9)
                print(
                    f"\n\n[ Timing ] Prefill: {self.prefill_tokens} tokens at "
                    f"{prefill_tps:.1f} tok/s; TTFT {self.time_to_first_token:.3f}s"
                )
        self.generated_tokens += num

    def notify_generate_done(self) -> None:
        self.generate_duration = time.monotonic() - self.generate_start
        if self.verbosity >= 1:
            tps = self.generated_tokens / max(self.generate_duration, 1e-9)
            print(
                f"\n[ Timing ] Generated {self.generated_tokens} tokens at "
                f"{tps:.1f} tok/s"
            )

    @property
    def prefill_tokens_per_second(self) -> float:
        return self.prefill_tokens / max(self.prefill_duration, 1e-9)

    @property
    def generate_tokens_per_second(self) -> float:
        return self.generated_tokens / max(self.generate_duration, 1e-9)
