from .fake import FakeDataset, planetoid_like

__all__ = ['FakeDataset', 'planetoid_like']
