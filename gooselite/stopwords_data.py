"""Per-language stopword tables.

[canon: goose resources/text/stopwords-{lang}.txt] — the Goose lineage ships
plain-text stopword files per language; we vendor them as frozensets so they
ride inside the --py-files zip and load once per executor Python worker
(SURVEY.md §1.1 "Stopword tables"). Lists here are the classic public
stopword lists the Goose files derive from (trimmed to the common core).
When /root/reference mounts (empty at build time, SURVEY.md §0.1), replace
these with the reference's files verbatim (SURVEY.md §0.3).

Languages: space-delimited set per SURVEY.md A8 / FIXTURES.md §1
(en, de, es, fr, it, pt, nl, sv). CJK segmentation variants are an explicit
non-goal until the reference ships them (SURVEY.md §2.7).
"""

from __future__ import annotations

_EN = """
a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could
couldn't did didn't do does doesn't doing don't down during each few for
from further had hadn't has hasn't have haven't having he he'd he'll he's
her here here's hers herself him himself his how how's i i'd i'll i'm i've
if in into is isn't it it's its itself let's me more most mustn't my myself
no nor not of off on once only or other ought our ours ourselves out over
own same shan't she she'd she'll she's should shouldn't so some such than
that that's the their theirs them themselves then there there's these they
they'd they'll they're they've this those through to too under until up
very was wasn't we we'd we'll we're we've were weren't what what's when
when's where where's which while who who's whom why why's with won't would
wouldn't you you'd you'll you're you've your yours yourself yourselves
will just also get got like one two may might must shall upon us
"""

_DE = """
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann das dass dasselbe dazu dein deine deinem deinen
deiner deines dem demselben den denn denselben der derer derselbe derselben
des desselben dessen dich die dies diese dieselbe dieselben diesem diesen
dieser dieses dir doch dort du durch ein eine einem einen einer eines einig
einige einigem einigen einiger einiges einmal er es etwas euer eure eurem
euren eurer eures für gegen gewesen hab habe haben hat hatte hatten hier
hin hinter ich ihm ihn ihnen ihr ihre ihrem ihren ihrer ihres im in indem
ins ist jede jedem jeden jeder jedes jene jenem jenen jener jenes jetzt
kann kein keine keinem keinen keiner keines können könnte machen man
manche manchem manchen mancher manches mein meine meinem meinen meiner
meines mich mir mit muss musste nach nicht nichts noch nun nur ob oder
ohne sehr sein seine seinem seinen seiner seines selbst sich sie sind so
solche solchem solchen solcher solches soll sollte sondern sonst um und
uns unser unsere unserem unseren unserer unseres unter viel vom von vor
war waren warst was weg weil weiter welche welchem welchen welcher welches
wenn werde werden wie wieder wir wird wirst wo wollen wollte während
würde würden zu zum zur zwar zwischen
"""

_ES = """
a al algo algunas algunos ante antes como con contra cual cuando de del
desde donde durante e el ella ellas ellos en entre era erais eran eras
eres es esa esas ese eso esos esta estaba estado estamos estar estas este
esto estos estoy fue fueron fui fuimos ha habéis había habían han has
hasta hay la las le les lo los me mi mis mucho muchos muy más mí mía
mías mío míos nada ni no nos nosotras nosotros nuestra nuestras nuestro
nuestros o os otra otras otro otros para pero poco por porque que quien
quienes qué se sea sean según ser si sido siendo sin sobre sois somos son
soy su sus suya suyas suyo suyos sí también tanto te tenéis tenemos tener
tengo ti tiene tienen toda todas todo todos tu tus tuya tuyas tuyo tuyos
tú un una unas uno unos usted ustedes vosotras vosotros vuestra vuestras
vuestro vuestros y ya yo él éramos
"""

_FR = """
a ai aie aient aies ait as au aura aurai auraient aurais aurait auras
aurez auriez aurions aurons auront aux avaient avais avait avec avez aviez
avions avons ayant ayez ayons c ce ceci cela celà ces cet cette d dans de
des du elle elles en es est et eu eue eues eurent eus eut eux furent fus
fut fût il ils j je l la le les leur leurs lui m ma mais me mes moi mon
même n ne nos notre nous on ont ou où par pas pour qu que quel quelle
quelles quels qui s sa sans se sera serai seraient serais serait seras
serez seriez serions serons seront ses soi soient sois soit sommes son
sont soyez soyons suis sur t ta te tes toi ton tu un une vos votre vous y
à été étée étées étés étaient étais était étant êtes être
"""

_IT = """
a ad agli ai al alla alle allo anche avere aveva avevano ben buono che chi
cinque comprare con consecutivi consecutivo cosa cui da del della dello
dentro deve devo di doppio due e ecco fare fine fino fra gente giu ha hai
hanno ho il indietro invece io la lavoro le lei lo loro lui lungo ma me
meglio molta molti molto nei nella nello noi nome nostro nove nuovi nuovo
o oltre ora otto peggio pero persone piu più poco primo promesso qua
quarto quasi quattro quello questo qui quindi quinto rispetto sara secondo
sei sembra sembrava senza sette sia siamo siete solo sono sopra soprattutto
sotto stati stato stesso su subito sul sulla tanto te tempo terzo tra tre
triplo ultimo un una uno va vai voi volte vostro
"""

_PT = """
a ao aos aquela aquelas aquele aqueles aquilo as até com como da das de
dela delas dele deles depois do dos e ela elas ele eles em entre era eram
essa essas esse esses esta estas este estes eu foi fomos for foram fosse
há isso isto já lhe lhes mais mas me mesmo meu meus minha minhas muito na
nas nem no nos nossa nossas nosso nossos num numa não nós o os ou para
pela pelas pelo pelos por qual quando que quem se seja sem ser seu seus
sua suas são só também te tem tém teu teus tu tua tuas um uma você vocês
vos à às é
"""

_NL = """
aan al alles als altijd andere ben bij daar dan dat de der deze die dit
doch doen door dus een eens en er ge geen geweest haar had heb hebben
heeft hem het hier hij hoe hun iemand iets ik in is ja je kan kon kunnen
maar me meer men met mij mijn moet na naar niet niets nog nu of om omdat
onder ons ook op over reeds te tegen toch toen tot u uit uw van veel voor
want waren was wat werd wezen wie wil worden wordt zal ze zelf zich zij
zijn zo zonder zou
"""

_SV = """
alla allt att av blev bli blir blivit de dem den denna deras dess dessa
det detta dig din dina ditt du där då efter ej eller en er era ert ett
från för ha hade han hans har henne hennes hon honom hur här i icke
ingen inom inte jag ju kan kunde man med mellan men mig min mina mitt
mot mycket ni nu när någon något några och om oss på samma sedan sig
sin sina sitta själv skulle som så sådan sådana sådant till under upp
ut utan vad var vara varför varit varje vars vart vem vi vid vilka
vilkas vilken vilket vår våra vårt än är åt över
"""

STOPWORDS: dict[str, frozenset[str]] = {
    lang: frozenset(words.split())
    for lang, words in (
        ("en", _EN), ("de", _DE), ("es", _ES), ("fr", _FR),
        ("it", _IT), ("pt", _PT), ("nl", _NL), ("sv", _SV),
    )
}

DEFAULT_LANGUAGE = "en"
