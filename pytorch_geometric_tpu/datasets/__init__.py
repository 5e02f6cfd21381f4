from . import graph_generator, motif_generator
from .fake import FakeDataset, planetoid_like
from .generators import (KarateClub, StochasticBlockModelDataset,
                         ExplainerDataset, FakeHeteroDataset, ba_graph,
                         BAShapes, BA2MotifDataset, BAMultiShapesDataset,
                         InfectionDataset, MixHopSyntheticDataset,
                         RandomPartitionGraphDataset)
from .planetoid import Planetoid
from .tu_dataset import TUDataset
from .npz_datasets import (Amazon, Coauthor, WebKB, WikipediaNetwork,
                           Actor, read_npz)
from .geometry import (ModelNet, FAUST, MD17, QM9, MovieLens,
                       JODIEDataset, parse_sdf)
from .social import (CitationFull, CoraFull, DeezerEurope, LastFMAsia,
                     FacebookPagePage, GitHub, Twitch, GemsecDeezer,
                     Airports, PolBlogs, EmailEUCore, WikiCS, PPI,
                     HeterophilousGraphDataset, LINKXDataset,
                     BitcoinOTC, EllipticBitcoinDataset,
                     AttributedGraphDataset, SNAPDataset)
from .kge_datasets import (FB15k_237, WordNet18, WordNet18RR,
                           Wikidata5M, RelLinkPredDataset, Entities,
                           ICEWS18, GDELT, GDELTLite, MyketDataset)
from .molecules import (ZINC, AQSOL, MoleculeNet, GNNBenchmarkDataset,
                        MNISTSuperpixels, LRGBDataset, MalNetTiny)
from .big_graphs import (Reddit, Reddit2, Flickr, Yelp, AmazonProducts,
                         NELL)
from .hetero_datasets import (DBLP, IMDB, MovieLens100K, MovieLens1M,
                              Taobao, LastFM, AMiner, OGB_MAG,
                              HGBDataset)
from .point_datasets import (GeometricShapes, SHREC2016, MedShapeNet,
                             Teeth3DS, CoMA, TOSCA, PCPNetDataset,
                             ShapeNet, S3DIS, DynamicFAUST, PascalPF,
                             WILLOWObjectClass)
from .misc_datasets import (AmazonBook, HM, CityNetwork, DGraphFin,
                            EllipticBitcoinTemporalDataset, GEDDataset,
                            BrcaTcga, DBP15K, UPFD,
                            SuiteSparseMatrixCollection, PCQM4Mv2,
                            CornellTemporalHyperGraphDataset,
                            CWQDataset, WebQSPDataset, AirfRANS,
                            NeuroGraphDataset, HydroNet,
                            OMDB, OSE_GVCS, GitMolDataset,
                            InstructMolDataset, MoleculeGPTDataset,
                            QM7b, PascalVOCKeypoints)
from .industrial import (OPFDataset, RCDD, GraphLandDataset,
                         IGMCDataset, TAGDataset, ProteinMPNNDataset)

__all__ = [
    'FakeDataset', 'planetoid_like', 'KarateClub',
    'StochasticBlockModelDataset', 'ExplainerDataset', 'FakeHeteroDataset',
    'ba_graph', 'BAShapes', 'BA2MotifDataset', 'BAMultiShapesDataset',
    'InfectionDataset', 'MixHopSyntheticDataset',
    'RandomPartitionGraphDataset',
    'Planetoid', 'TUDataset', 'Amazon', 'Coauthor', 'WebKB',
    'WikipediaNetwork', 'Actor', 'read_npz', 'ModelNet', 'FAUST', 'MD17',
    'QM9', 'MovieLens', 'JODIEDataset', 'parse_sdf',
    'CitationFull', 'CoraFull', 'DeezerEurope', 'LastFMAsia',
    'FacebookPagePage', 'GitHub', 'Twitch', 'GemsecDeezer', 'Airports',
    'PolBlogs', 'EmailEUCore', 'WikiCS', 'PPI',
    'HeterophilousGraphDataset', 'LINKXDataset', 'BitcoinOTC',
    'EllipticBitcoinDataset', 'AttributedGraphDataset', 'SNAPDataset',
    'FB15k_237', 'WordNet18', 'WordNet18RR', 'Wikidata5M',
    'RelLinkPredDataset', 'Entities', 'ICEWS18', 'GDELT', 'GDELTLite',
    'MyketDataset',
    'ZINC', 'AQSOL', 'MoleculeNet', 'GNNBenchmarkDataset',
    'MNISTSuperpixels', 'LRGBDataset', 'MalNetTiny',
    'Reddit', 'Reddit2', 'Flickr', 'Yelp', 'AmazonProducts', 'NELL',
    'DBLP', 'IMDB', 'MovieLens100K', 'MovieLens1M', 'Taobao', 'LastFM',
    'AMiner', 'OGB_MAG', 'HGBDataset',
    'GeometricShapes', 'SHREC2016', 'MedShapeNet', 'Teeth3DS', 'CoMA',
    'TOSCA', 'PCPNetDataset', 'ShapeNet', 'S3DIS', 'DynamicFAUST',
    'PascalPF', 'WILLOWObjectClass',
    'AmazonBook', 'HM', 'CityNetwork', 'DGraphFin',
    'EllipticBitcoinTemporalDataset', 'GEDDataset', 'BrcaTcga',
    'DBP15K', 'UPFD', 'SuiteSparseMatrixCollection', 'PCQM4Mv2',
    'CornellTemporalHyperGraphDataset', 'CWQDataset', 'WebQSPDataset',
    'AirfRANS', 'NeuroGraphDataset', 'OPFDataset', 'HydroNet', 'OMDB',
    'OSE_GVCS', 'RCDD', 'IGMCDataset', 'GraphLandDataset', 'TAGDataset',
    'ProteinMPNNDataset', 'GitMolDataset', 'InstructMolDataset',
    'MoleculeGPTDataset', 'QM7b', 'PascalVOCKeypoints',
]
