"""Running-average meter with the reference's exact semantics
(reference utils.py:4-19): `update(val, n)` records the raw value and a
weighted running mean where `n` is the weight (the reference passes the
batch's non-special-token count)."""


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0
