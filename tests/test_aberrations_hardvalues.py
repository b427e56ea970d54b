"""Hard-coded third-order aberration values of published sample
systems, generated from the reference by
tools/gen_hardvals_aberrations_r5.py (reference:
optiland/aberrations.py per W. Smith ch. 6.3)."""

import numpy as np
import pytest

import optiland_tpu.samples as S


@pytest.fixture(scope='module')
def lenses():
    cache = {}

    def get(name):
        if name not in cache:
            cache[name] = getattr(S, name)()
        return cache[name]

    return get


def test_cooketriplet_seidel_sums(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.seidels(), float))
    np.testing.assert_allclose(
        got, np.array([-0.006960263348695752, 0.0012348875115412107, 0.00890660690478696, -0.025715842849072537, 0.0018588178381367295]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_tsc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.TSC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.06927285371646213, -0.05628070846018346, 0.2605756411229429, 0.12067371387877467, -0.0203996775534136, -0.270097281027141]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_sc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.SC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.6927255317124286, -0.5628046428231352, 2.6057451059692878, 1.2067319032725552, -0.20399589047956782, -2.7009610919081264]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_cc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.CC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.05295505694976111, 0.17505402443537993, -0.40694370329785856, 0.21936734509638692, -0.08065887335361074, 0.15231067483893165]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_tcc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.TCC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.15886517084928334, 0.5251620733061397, -1.2208311098935756, 0.6581020352891608, -0.24197662006083223, 0.45693202451679493]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_tac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.TAC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.04048105291042801, -0.5444833995418171, 0.6355282364081064, 0.3987780813887879, -0.3189194453509955, -0.0858895786794671]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_ac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.AC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.4048087728049116, -5.444810372617329, 6.355254791235004, 3.9877635126162434, -3.189180616962232, -0.8588920604140078]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_tpc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.TPC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.2886358800538858, -0.014581204119390507, 0.2863372708215324, 0.31344939124511273, -0.07973926783924697, -0.3454089664493879]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_pc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.PC(), float))
    np.testing.assert_allclose(
        got, np.array([-2.8863462778652265, -0.14581140857795896, 2.8633602852684943, 3.1344803132256054, -0.7973892188474312, -3.45407467867938]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_dc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.DC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.25159070246465415, 1.7388997307932261, -1.439687001585803, 1.294726454954076, -1.5762681823931304, 0.24321374956389988]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_tachc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.TAchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.0720619820943124, -0.05043780718016792, 0.15872676317103065, 0.10586070024593972, -0.030946572889962186, -0.08730853751931116]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_lchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.LchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.7206166944826062, -0.5043758835214215, 1.5872607452364162, 1.058602409617373, -0.309464386260473, -0.8730815872499065]),
        rtol=1e-6, atol=1e-10)

def test_cooketriplet_tchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('CookeTriplet').aberrations.TchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.055087182943787505, 0.1568804191018763, -0.24788524567737943, 0.19243943039927294, -0.12236054697060902, 0.049234195243269406]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_seidel_sums(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.seidels(), float))
    np.testing.assert_allclose(
        got, np.array([-0.003929457875534853, 0.00039545976332185654, 0.003423905503173008, -0.01626475373522642, -0.046484107476755965]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_tsc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.TSC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.06660503684840062, -0.00015838308990287549, -0.0205454105880723, -0.000813314713818196, 0.08727276162737767, 0.0, 0.13184621699875151, -9.993846874503628e-05, -0.07292521434538969, 1.2297775298427728e-05, -0.07763126772477318]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_sc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.SC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.6660503684840061, -0.0015838308990287547, -0.205454105880723, -0.00813314713818196, 0.8727276162737766, 0.0, 1.318462169987515, -0.0009993846874503628, -0.7292521434538969, 0.00012297775298427728, -0.7763126772477317]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_cc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.CC(), float))
    np.testing.assert_allclose(
        got, np.array([0.0028389741877534944, 0.004184473908799856, -0.004589736235420318, 0.002016074899466183, 0.045143493727895466, -0.0, -0.10802613684374712, -0.00067869798458094, 0.028838428404665585, 0.0007897676025578196, 0.031460657149219265]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_tcc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.TCC(), float))
    np.testing.assert_allclose(
        got, np.array([0.008516922563260483, 0.012553421726399568, -0.013769208706260954, 0.006048224698398549, 0.1354304811836864, -0.0, -0.32407841053124137, -0.00203609395374282, 0.08651528521399676, 0.0023693028076734587, 0.0943819714476578]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_tac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.TAC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.00012100848254277563, -0.11055360710644178, -0.0010253228389098252, -0.004997521784864881, 0.023351329646949463, 0.0, 0.08850952653040083, -0.004609145607877932, -0.011404216776273348, 0.05071916268706507, -0.01274966875163977]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_ac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.AC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.0012100848254277563, -1.1055360710644178, -0.010253228389098252, -0.049975217848648806, 0.23351329646949462, 0.0, 0.8850952653040082, -0.04609145607877932, -0.11404216776273347, 0.5071916268706507, -0.1274966875163977]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_tpc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.TPC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.21215581672106157, 0.07829792292234376, -0.3117058853090492, 0.0, 0.4827686908149669, -0.0, 0.4122347388721732, -0.0, -0.3138100142029794, -0.0670834286366052, -0.1498699764159206]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_pc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.PC(), float))
    np.testing.assert_allclose(
        got, np.array([-2.1215581672106154, 0.7829792292234375, -3.1170588530904917, 0.0, 4.827686908149669, -0.0, 4.122347388721732, -0.0, -3.138100142029794, -0.6708342863660519, -1.498699764159206]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_dc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.DC(), float))
    np.testing.assert_allclose(
        got, np.array([0.009048090894131555, 0.8521936840707884, -0.0698625005244123, 0.01238804371643763, 0.26180019450785147, 0.0, -0.41027698609367247, -0.03130143851500822, 0.12860664724074924, -1.0509191112183658, 0.06590283853772069]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_tachc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.TAchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.12817607630998823, -0.007604223472974272, -0.11060554411099002, 0.06748930142465438, 0.18630719931558318, -0.0, 0.15531231382825575, 0.015149313079195979, -0.07396728315161906, -0.0025343106432349502, -0.07180013866006385]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_lchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.LchC(), float))
    np.testing.assert_allclose(
        got, np.array([-1.2817607630998822, -0.07604223472974271, -1.1060554411099002, 0.6748930142465438, 1.8630719931558317, -0.0, 1.5531231382825574, 0.15149313079195978, -0.7396728315161906, -0.0253431064323495, -0.7180013866006385]),
        rtol=1e-6, atol=1e-10)

def test_doublegauss_tchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('DoubleGauss').aberrations.TchC(), float))
    np.testing.assert_allclose(
        got, np.array([0.005463379187970778, 0.2009032324022526, -0.024708694502280193, -0.1672950018892292, 0.09637093781533766, 0.0, -0.1272527164529038, 0.10288138675475415, 0.02925051669169962, -0.162754351276879, 0.02909754808666913]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_seidel_sums(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.seidels(), float))
    np.testing.assert_allclose(
        got, np.array([-0.00014682396131220912, -7.328852056939072e-07, -9.132676854314197e-05, -0.00072398974024053, -0.003993790165440175]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_tsc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.TSC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.00016546606501127814, 0.0024169233343294435, -0.00030300777916100616, 0.0029154488816245244, -0.0027768855949620876, -0.00019105153290658073, -0.002179059185790229, -0.0041503825812225234, 0.0, 0.004966977440906175, 0.0025515593991547844, -5.699306382936014e-05, -0.004009454319603504]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_sc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.SC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.0022119947800751925, 0.03231008000954311, -0.004050689340927023, 0.03897450336593153, -0.0371221521494662, -0.0025540281838811827, -0.029130248212008606, -0.05548342860727047, 0.0, 0.06639988792437186, 0.03410993107014106, -0.0007618985783123814, -0.053599461770656005]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_cc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.CC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.0002179002431568192, -0.004875184899869098, -0.0010128067223359766, 0.0011032270780083411, -0.003405042031850703, 0.0011722088724353166, -0.002737025920924134, 0.01109511028552136, -0.0, -0.011450081493029897, 0.007459992386651301, -0.0006676583787848422, 0.0035302623642407185]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_tcc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.TCC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.0006537007294704577, -0.014625554699607295, -0.00303842016700793, 0.0033096812340250234, -0.01021512609555211, 0.0035166266173059495, -0.008211077762772401, 0.03328533085656408, -0.0, -0.034350244479089694, 0.022379977159953903, -0.0020029751363545263, 0.010590787092722155]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_tac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.TAC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.00028695017292255465, 0.009833753297146166, -0.003385317233931104, 0.0004174691565755163, -0.004175293090829787, -0.0071921623433817885, -0.0034378648091166475, -0.029660271032561407, 0.0, 0.026395200654083732, 0.02181077439440766, -0.007821437922626039, -0.0031083412771259387]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_ac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.AC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.003836026949713837, 0.13146025416360693, -0.04525582964605939, 0.005580839763878435, -0.05581643898747456, -0.09614675710049382, -0.045958299738692025, -0.39650646611539, 0.0, 0.3528581287159451, 0.2915722876865357, -0.10455908198670055, -0.041553140695200504]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_tpc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.TPC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.011376495681208375, 0.020377079101162765, -0.004453342648664172, 0.010803485547778512, -0.007579035184169717, -0.005182195144361331, -0.015053039434270063, -0.0039073167602706035, -0.0, 0.007894410236877524, 0.020807522311085368, -0.0022428241760117074, -0.014927492777200532]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_pc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.PC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.15208404853687474, 0.27240626409940366, -0.059533480125123855, 0.14442389523601118, -0.10131857710066988, -0.06927697596408638, -0.20123307247683608, -0.05223405945641956, -0.0, 0.10553459547463712, 0.27816054449159594, -0.02998267572040341, -0.19955473105936922]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_dc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.DC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.015359449609732997, -0.060938380555448785, -0.02620080397005037, 0.004246090936106729, -0.014413262795254244, 0.0759236600572664, -0.02322565836922044, 0.0897353632567261, 0.0, -0.0790458269112176, 0.12460308353406967, -0.11790011739956058, 0.015880272250109163]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_tachc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.TAchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.0011983827336681594, 0.002671660197912252, -0.0010856682573470615, 0.002885269605157548, -0.0043965375245640925, -0.0024106140097681222, -0.002851647871175071, -0.0027131910527960204, -0.0, 0.006693528928791082, 0.006162482291537823, -0.0007673886556294749, -0.003546511092186732]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_lchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.LchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.016020302115878134, 0.03571547079163182, -0.014513504735737478, 0.03857105869583046, -0.058774093975569056, -0.032225735264930416, -0.03812159432945874, -0.036270666409589467, -0.0, 0.08948089174513814, 0.08238171772718691, -0.010258657570817432, -0.04741071241925718]),
        rtol=1e-6, atol=1e-10)

def test_reversetelephoto_tchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('ReverseTelephoto').aberrations.TchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.001578135607705587, -0.005389015559344059, -0.003628857689107779, 0.001091807020121915, -0.005391073760081919, 0.014790476094472288, -0.0035818366897289312, 0.007253103386819478, 0.0, -0.015430199275603823, 0.018017245059226944, -0.008989751230947413, 0.0031226480301556796]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_seidel_sums(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.seidels(), float))
    np.testing.assert_allclose(
        got, np.array([-0.0013515784313228047, 0.00031745473966597647, 0.0006712899125506362, -0.0020397161459897407, 0.0007591211077270911]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_tsc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.TSC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.01749721549795141, -0.021304556894344295, 0.04937448025286754, 0.01960354342589806, -0.0, -1.1543185429366361e-06, -0.007794626704297533, -0.028462573204582037]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_sc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.SC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.15747493948156266, -0.19174101204909866, 0.4443703222758078, 0.17643189083308253, -0.0, -1.0388866886429725e-05, -0.0701516403386778, -0.2561631588412383]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_cc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.CC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.009928494951556312, 0.0400637206505113, -0.06424625581508321, 0.024760777464100808, -0.0, -8.778005368495854e-05, -0.008984668259046915, 0.01985124729325618]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_tcc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.TCC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.029785484854668937, 0.1201911619515339, -0.19273876744524965, 0.07428233239230242, -0.0, -0.00026334016105487564, -0.026954004777140744, 0.059553741879768536]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_tac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.TAC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.005633754240188698, -0.07534076959790284, 0.0835974650288576, 0.03127475922627165, -0.0, -0.006675226584623246, -0.010356398938337629, -0.01384527028759899]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_ac_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.AC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.05070378816169828, -0.6780669263811255, 0.7523771852597184, 0.2814728330364449, -0.0, -0.06007703926160921, -0.09320759044503865, -0.1246074325883909]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_tpc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.TPC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.03574333308224971, -0.004775977771851819, 0.022710921668601038, 0.03918537891133613, -0.0, 0.005511433662696372, -0.004760608612623032, -0.03130653743286282]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_pc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.PC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.32168999774024737, -0.04298379994666637, 0.20439829501740933, 0.35266841020202516, -0.0, 0.049602902964267344, -0.04284547751360728, -0.28175883689576536]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_dc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.DC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.023478718807517264, 0.1506614290063707, -0.138328864872599, 0.08899655346034382, 0.0, -0.08850053201521096, -0.01742499071058841, 0.03149116892397301]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_tachc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.TAchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.008817639528216632, -0.0072515252469991225, 0.015696798129119643, 0.011833728571363434, 0.0, -0.0001140334830575995, -0.0011612805774138095, -0.007962881312505958]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_lchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.LchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.07935875575394968, -0.0652637272229921, 0.1412711831620768, 0.1065035571422709, 0.0, -0.0010263013475183954, -0.010451525196724284, -0.07166593181255362]),
        rtol=1e-6, atol=1e-10)

def test_tessarlens_tchc_terms(lenses):
    got = np.ravel(np.asarray(
        lenses('TessarLens').aberrations.TchC(), float))
    np.testing.assert_allclose(
        got, np.array([-0.005003418375386197, 0.013636663894334633, -0.02042473162079659, 0.014946905942473934, 0.0, -0.00867166634888613, -0.0013385786310953084, 0.005553718736714809]),
        rtol=1e-6, atol=1e-10)
