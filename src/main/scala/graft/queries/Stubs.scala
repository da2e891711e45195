package graft.queries
// (all query groups implemented — this file intentionally left as the
// anchor for future additions)
