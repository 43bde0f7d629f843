package javaref;

import java.io.File;
import java.util.List;

import model.feature.PairFeatureVector;
import parser.TXPParser;
import parser.TXPParser.Field;
import parser.entities.Doc;
import parser.entities.EntityEnum;
import relpro.CauseRelPro;
import relpro.TempRelPro;

/**
 * Golden-output driver for the reference system.  Compiles against the
 * UNMODIFIED reference sources (plus compile-only stubs for jars absent in
 * this environment: ws4j/jython/weka/stanford — see ../stubs) and runs the
 * exact TempRelPro / CauseRelPro test flows (TempRelPro.java main, variant 2;
 * CauseRelPro.java main, variant 2) over .txp files given on the command line.
 *
 * Must be run with working directory = the reference checkout so that
 * ./resource/*.list and models/*.model resolve.
 *
 * Usage:  java javaref.Driver temprel|causal|features file1.txp [file2.txp ...]
 * Output (stdout), one row per prediction:
 *   temprel:  <fileName> TAB <srcId> TAB <tgtId> TAB <label>
 *   causal:   <fileName> TAB <srcId> TAB <tgtId> TAB <label>
 *   features: <fileName> TAB <cat> TAB <csvVector>   (cat in dct|et|ee|caus)
 */
public class Driver {

    // Field layout of the synthetic corpus files (erex/txp.py DEFAULT_FIELDS).
    static final Field[] FIELDS = {
        Field.token, Field.token_id, Field.sent_id, Field.pos, Field.lemma,
        Field.deps, Field.tmx_id, Field.tmx_type, Field.tmx_value, Field.ner,
        Field.ev_class, Field.ev_id, Field.chunk, Field.main_verb,
        Field.connective, Field.tense_aspect_pol, Field.supersense,
        Field.coref_event, Field.tlink, Field.clink, Field.csignal,
    };

    // 24-column layout of the reference's example files without causal
    // annotation (TempRelPro.java main, fieldsFile).
    static final Field[] FIELDS_EXAMPLE24 = {
        Field.token, Field.token_id, Field.sent_id, Field.pos, Field.lemma,
        Field.deps, Field.tmx_id, Field.tmx_type, Field.tmx_value, Field.ner,
        Field.ev_class, Field.ev_id, Field.role1, Field.role2, Field.role3,
        Field.is_arg_pred, Field.has_semrole, Field.chunk, Field.main_verb,
        Field.connective, Field.morpho, Field.tense_aspect_pol,
        Field.coref_event, Field.tlink,
    };

    // 28-column layout with causal annotation (CauseRelPro.java main,
    // fieldsFile).
    static final Field[] FIELDS_EXAMPLE28 = {
        Field.token, Field.token_id, Field.sent_id, Field.pos, Field.lemma,
        Field.deps, Field.tmx_id, Field.tmx_type, Field.tmx_value, Field.ner,
        Field.ev_class, Field.ev_id, Field.role1, Field.role2, Field.role3,
        Field.is_arg_pred, Field.has_semrole, Field.chunk, Field.main_verb,
        Field.connective, Field.morpho, Field.tense_aspect_pol,
        Field.coref_event, Field.tlink, Field.supersense, Field.ss_ner,
        Field.clink, Field.csignal,
    };

    static Field[] fieldsFor(String path) throws Exception {
        // Decide the layout by the real column count of the first data row
        // (line 5, the DCT row), ignoring trailing tabs — mirroring how the
        // reference mains hard-code a Field[] per corpus.
        java.io.BufferedReader r = new java.io.BufferedReader(new java.io.FileReader(path));
        for (int skip = 0; skip < 4; skip++) r.readLine();
        String row = r.readLine();
        r.close();
        int n = row.replaceAll("\t+$", "").split("\t").length;
        if (n == FIELDS_EXAMPLE28.length) return FIELDS_EXAMPLE28;
        if (n == FIELDS_EXAMPLE24.length) return FIELDS_EXAMPLE24;
        return FIELDS;
    }

    public static void main(String[] args) throws Exception {
        String mode = args[0];
        if (mode.equals("writetml")) {
            // writetml <txpFile> <tmlFile> <outDir> — run the temprel
            // test flow and render the full system TimeML document via
            // the reference's own writeTimeMLFile
            // (TempEval3TaskABC.java:252-416)
            String txpPath = args[1], tmlPath = args[2], outDir = args[3];
            TXPParser txpParser = new TXPParser(EntityEnum.Language.EN,
                    fieldsFor(txpPath));
            TempRelPro trp = new TempRelPro();
            List<List<PairFeatureVector>> fvs =
                    trp.buildFeatureVectorFromFile(txpParser, txpPath);
            TXPParser parser2 = new TXPParser(EntityEnum.Language.EN,
                    fieldsFor(txpPath));
            Doc docTxp = parser2.parseDocument(txpPath);
            java.util.List<String> tt = new java.util.ArrayList<>();
            java.util.List<String> et = new java.util.ArrayList<>();
            java.util.List<String> ee = new java.util.ArrayList<>();
            for (String p : trp.testModel(docTxp, fvs)) {
                String[] c = p.split("\t");
                boolean sT = c[0].startsWith("tmx");
                boolean tT = c[1].startsWith("tmx");
                String row = c[0] + "\t" + c[1] + "\tNONE\t" + c[2];
                if (sT && tT) tt.add(row);
                else if (!sT && tT) et.add(row);
                else if (!sT && !tT) ee.add(row);
            }
            TXPParser parser3 = new TXPParser(EntityEnum.Language.EN,
                    fieldsFor(txpPath));
            parser.TimeMLParser tmlParser =
                    new parser.TimeMLParser(EntityEnum.Language.EN);
            task.JavarefTmlBridge.writeTimeML(parser3, txpPath,
                    tmlParser, tmlPath, tt, et, ee, outDir);
            return;
        }
        if (mode.equals("dense") || mode.equals("densefeat")) {
            // dense|densefeat <txpFile...> — the TimeBank-Dense
            // classifier flow (tbdense models, predictDense, 167-dim
            // E-DCT vectors); see task.JavarefDenseBridge.
            String[] paths = new String[args.length - 1];
            System.arraycopy(args, 1, paths, 0, paths.length);
            task.JavarefDenseBridge.run(mode, paths,
                    new task.JavarefDenseBridge.FieldsResolver() {
                        public Field[] fieldsFor(String p) throws Exception {
                            return Driver.fieldsFor(p);
                        }
                    });
            return;
        }
        if (mode.equals("taskc")) {
            // taskc <clinkFile|-> <txpFile...> — TempEval3TaskC.main's
            // per-file merge path (R4 anchor reasoning + R6 CLINK
            // post-edit), pinned up to the (jython-absent) closure; see
            // task.JavarefTaskCBridge.
            String[] paths = new String[args.length - 2];
            System.arraycopy(args, 2, paths, 0, paths.length);
            task.JavarefTaskCBridge.run(args[1], paths,
                    new task.JavarefTaskCBridge.FieldsResolver() {
                        public Field[] fieldsFor(String p) throws Exception {
                            return Driver.fieldsFor(p);
                        }
                    });
            return;
        }
        for (int i = 1; i < args.length; i++) {
            String path = args[i];
            String name = new File(path).getName();
            TXPParser parser = new TXPParser(EntityEnum.Language.EN, fieldsFor(path));
            if (mode.equals("temprel")) {
                TempRelPro task = new TempRelPro();
                List<List<PairFeatureVector>> fvs = task.buildFeatureVectorFromFile(parser, path);
                TXPParser parser2 = new TXPParser(EntityEnum.Language.EN, fieldsFor(path));
                Doc docTxp = parser2.parseDocument(path);
                for (String p : task.testModel(docTxp, fvs)) {
                    System.out.println(name + "\t" + p);
                }
            } else if (mode.equals("causal")) {
                CauseRelPro task = new CauseRelPro();
                List<List<PairFeatureVector>> fvs = task.buildFeatureVectorFromFile(parser, path);
                for (String p : task.testModel(fvs)) {
                    System.out.println(name + "\t" + p);
                }
            } else if (mode.equals("features")) {
                TempRelPro task = new TempRelPro();
                List<List<PairFeatureVector>> fvs = task.buildFeatureVectorFromFile(parser, path);
                String[] cats = {"dct", "et", "ee"};
                for (int c = 0; c < 3; c++) {
                    for (PairFeatureVector fv : fvs.get(c)) {
                        System.out.println(name + "\t" + cats[c]
                                + "\t" + fv.getE1().getID() + "\t" + fv.getE2().getID()
                                + "\t" + fv.printCSVVectors());
                    }
                }
                CauseRelPro ctask = new CauseRelPro();
                TXPParser parser3 = new TXPParser(EntityEnum.Language.EN, fieldsFor(path));
                List<List<PairFeatureVector>> cfvs = ctask.buildFeatureVectorFromFile(parser3, path);
                for (PairFeatureVector fv : cfvs.get(0)) {
                    System.out.println(name + "\tcaus"
                            + "\t" + fv.getE1().getID() + "\t" + fv.getE2().getID()
                            + "\t" + fv.printCSVVectors());
                }
            } else if (mode.equals("tempmark")) {
                // dump the temporal-signal marker of every candidate
                // pair (PairFeatureVector.getTemporalSignal)
                TempRelPro task = new TempRelPro();
                List<List<PairFeatureVector>> fvs = task.buildFeatureVectorFromFile(parser, path);
                String[] cats = {"dct", "et", "ee"};
                for (int c = 0; c < 3; c++) {
                    for (PairFeatureVector fv : fvs.get(c)) {
                        model.feature.Marker m = fv.getTemporalSignal();
                        System.out.println(name + "\t" + cats[c]
                                + "\t" + fv.getE1().getID() + "\t" + fv.getE2().getID()
                                + "\t" + m.getText() + "\t" + m.getCluster()
                                + "\t" + m.getPosition() + "\t" + m.getDepRelE1()
                                + "\t" + m.getDepRelE2());
                    }
                }
            } else if (mode.equals("verbmark")) {
                // dump the causal verb marker of every ee candidate
                // pair (getCausalVerb; null clusters printed as-is)
                TempRelPro task = new TempRelPro();
                List<List<PairFeatureVector>> fvs = task.buildFeatureVectorFromFile(parser, path);
                for (PairFeatureVector fv : fvs.get(2)) {
                    model.feature.Marker m = fv.getCausalVerb();
                    System.out.println(name + "\tee"
                            + "\t" + fv.getE1().getID() + "\t" + fv.getE2().getID()
                            + "\t" + m.getText() + "\t" + m.getCluster()
                            + "\t" + m.getPosition() + "\t" + m.getDepRelE1()
                            + "\t" + m.getDepRelE2());
                }
            } else if (mode.equals("entmark")) {
                // dump the PER-ENTITY temporal signal marker of e2 for
                // every et/ee candidate pair (the marker consumed by the
                // shipped EE feature vector; skipping dct pairs — the
                // reference NPEs on the DCT's null sentence id)
                TempRelPro task = new TempRelPro();
                List<List<PairFeatureVector>> fvs = task.buildFeatureVectorFromFile(parser, path);
                String[] cats = {"dct", "et", "ee"};
                for (int c = 1; c < 3; c++) {
                    for (PairFeatureVector fv : fvs.get(c)) {
                        model.feature.Marker m =
                                fv.getTemporalSignalPerEntity(fv.getE2());
                        System.out.println(name + "\t" + cats[c]
                                + "\t" + fv.getE1().getID() + "\t" + fv.getE2().getID()
                                + "\t" + m.getText() + "\t" + m.getCluster()
                                + "\t" + m.getPosition() + "\t" + m.getDepRelE1()
                                + "\t" + m.getDepRelE2());
                    }
                }
            } else if (mode.equals("connmark")) {
                // dump temporal+causal discourse-connective markers of
                // every et/ee candidate pair (getTemporalConnective /
                // getCausalConnective; dct pairs skipped — the DCT's
                // null sentence id NPEs the cross-sentence branch)
                TempRelPro task = new TempRelPro();
                List<List<PairFeatureVector>> fvs = task.buildFeatureVectorFromFile(parser, path);
                String[] cats = {"dct", "et", "ee"};
                for (int c = 1; c < 3; c++) {
                    for (PairFeatureVector fv : fvs.get(c)) {
                        model.feature.Marker t = fv.getTemporalConnective();
                        model.feature.Marker u = fv.getCausalConnective();
                        System.out.println(name + "\t" + cats[c]
                                + "\t" + fv.getE1().getID() + "\t" + fv.getE2().getID()
                                + "\t" + t.getText() + "\t" + t.getPosition()
                                + "\t" + t.getDepRelE1() + "\t" + t.getDepRelE2()
                                + "\t" + u.getText() + "\t" + u.getPosition()
                                + "\t" + u.getDepRelE1() + "\t" + u.getDepRelE2());
                    }
                }
            } else if (mode.equals("entorder")) {
                // ground truth for erex/javamap.py: the entity HashMap's
                // iteration order
                Doc doc = parser.parseDocument(path);
                for (String k : doc.getEntities().keySet()) {
                    System.out.println(name + "\t" + k);
                }
            } else if (mode.equals("ttorder")) {
                // ground truth for the ttlinks HashMap emission order
                TempRelPro trp2 = new TempRelPro();
                Doc doc = parser.parseDocument(path);
                for (String k : trp2.getTimexTimexRuleRelation(doc).keySet()) {
                    System.out.println(name + "\t" + k.replace("\t", "|"));
                }
            } else if (mode.equals("causmark")) {
                // dump the causal-signal marker of every causal candidate
                // pair (the fvListNone gate, CauseRelPro.java:219-222)
                CauseRelPro task = new CauseRelPro();
                parser.entities.Doc doc = parser.parseDocument(path);
                java.util.Map<String, String> cands = task.getCandidatePairs(doc);
                model.feature.TemporalSignalList tsl =
                        new model.feature.TemporalSignalList(EntityEnum.Language.EN);
                model.feature.CausalSignalList csl =
                        new model.feature.CausalSignalList(EntityEnum.Language.EN);
                for (String pair : cands.keySet()) {
                    parser.entities.Entity e1 = doc.getEntities().get(pair.split(",")[0]);
                    parser.entities.Entity e2 = doc.getEntities().get(pair.split(",")[1]);
                    PairFeatureVector fv = new PairFeatureVector(doc, e1, e2,
                            cands.get(pair), tsl, csl);
                    model.feature.EventEventFeatureVector eefv =
                            new model.feature.EventEventFeatureVector(fv);
                    String rule = model.rule.EventEventRelationRule
                            .getEventCausalityRule(eefv);
                    model.feature.Marker m = fv.getCausalSignal();
                    System.out.println(name + "\t" + pair.split(",")[0]
                            + "\t" + pair.split(",")[1] + "\t" + rule
                            + "\t" + m.getText() + "\t" + m.getCluster()
                            + "\t" + m.getPosition() + "\t" + m.getDepRelE1()
                            + "\t" + m.getDepRelE2());
                }
            } else {
                throw new IllegalArgumentException("unknown mode " + mode);
            }
        }
    }
}
