"""Host-side directory crawling (gitignore-aware)."""

from sema_tpu.crawl.crawler import FileCrawler
from sema_tpu.crawl.gitignore import GitignoreMatcher

__all__ = ["FileCrawler", "GitignoreMatcher"]
