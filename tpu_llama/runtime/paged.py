"""Host-side page allocator for the paged KV cache (SURVEY §2.1 RunState row;
VERDICT r1 missing #1).

The device side is ``models.llama.PagedKVCache`` (shared pools + page table);
this module owns the free list.  Policy: FULL RESERVATION at admission — a
request reserves every page its step budget could touch, so decode never
fails mid-flight and retirement frees everything at once.  Page 0 is reserved
as the trash page: parked (inactive) slots keep ``page_table[slot, :] == 0``
and their garbage decode writes land there, never aliasing a live page (the
dense cache got this isolation for free from per-slot rows).
"""

from __future__ import annotations

import numpy as np


class PagePool:
    def __init__(self, num_pages: int, page_size: int, slots: int,
                 max_pages_per_slot: int):
        if num_pages < 2:
            raise ValueError("need >= 2 pages (page 0 is the trash page)")
        self.page_size = page_size
        self.num_pages = num_pages
        self.max_pages_per_slot = max_pages_per_slot
        self._free: list[int] = list(range(num_pages - 1, 0, -1))  # pop() -> 1..
        self._by_slot: dict[int, list[int]] = {}
        # host mirror of the device page table
        self.table = np.zeros((slots, max_pages_per_slot), np.int32)

    # ---- queries ----
    def pages_needed(self, n_tokens: int) -> int:
        return -(-max(n_tokens, 1) // self.page_size)

    def can_reserve(self, n_tokens: int) -> bool:
        return (self.pages_needed(n_tokens) <= len(self._free)
                and self.pages_needed(n_tokens) <= self.max_pages_per_slot)

    @property
    def free_pages(self) -> int:
        return len(self._free)

    # ---- lifecycle ----
    def reserve(self, slot: int, n_tokens: int) -> np.ndarray | None:
        """Reserve pages covering positions [0, n_tokens); returns the slot's
        page-table row, or None if the pool can't satisfy it."""
        if slot in self._by_slot:
            raise ValueError(f"slot {slot} already holds pages")
        n = self.pages_needed(n_tokens)
        if n > len(self._free) or n > self.max_pages_per_slot:
            return None
        pages = [self._free.pop() for _ in range(n)]
        self._by_slot[slot] = pages
        row = np.zeros(self.max_pages_per_slot, np.int32)
        row[: len(pages)] = pages
        self.table[slot] = row
        return row

    def release(self, slot: int) -> bool:
        """Free all of a slot's pages; returns True if it held any."""
        pages = self._by_slot.pop(slot, None)
        if pages is None:
            return False
        self._free.extend(reversed(pages))
        self.table[slot] = 0
        return True

    def held(self, slot: int) -> int:
        return len(self._by_slot.get(slot, ()))
