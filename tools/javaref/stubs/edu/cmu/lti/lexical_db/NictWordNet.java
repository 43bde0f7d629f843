package edu.cmu.lti.lexical_db;

import java.io.BufferedReader;
import java.io.FileReader;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.List;
import java.util.Map;

/**
 * Lexical database over the vendored wnlin files (the ws4j jar's
 * WordNet data does not exist in this sandbox).  Loads the SAME
 * erex/resources/wnlin/{synsets,words}.tsv the Python engine reads
 * (erex/wnlin.py), so Lin similarity is computed from genuinely shared
 * data on both sides of the parity boundary.  Directory resolved from
 * -Derex.wnlin.dir, then $EREX_WNLIN_DIR, then the repo default.
 */
public class NictWordNet implements ILexicalDatabase {

    private static Map<String, List<String>> WORDS;   // "lemma|pos" -> synsets
    private static Map<String, String> PARENT;        // synset -> parent|null
    private static Map<String, Double> IC;            // synset -> ic

    private static synchronized void load() {
        if (WORDS != null) return;
        String dir = System.getProperty("erex.wnlin.dir");
        if (dir == null) dir = System.getenv("EREX_WNLIN_DIR");
        if (dir == null) dir = "/root/repo/erex/resources/wnlin";
        Map<String, List<String>> words = new HashMap<>();
        Map<String, String> parent = new HashMap<>();
        Map<String, Double> ic = new HashMap<>();
        try {
            BufferedReader r = new BufferedReader(
                    new FileReader(dir + "/synsets.tsv"));
            String line;
            while ((line = r.readLine()) != null) {
                String[] c = line.split("\t");
                parent.put(c[0], c[2].equals("-") ? null : c[2]);
                ic.put(c[0], Double.parseDouble(c[3]));
            }
            r.close();
            r = new BufferedReader(new FileReader(dir + "/words.tsv"));
            while ((line = r.readLine()) != null) {
                String[] c = line.split("\t");
                List<String> sids = new ArrayList<>();
                for (String s : c[2].split(",")) sids.add(s);
                words.put(c[0] + "|" + c[1], sids);
            }
            r.close();
        } catch (Exception e) {
            throw new RuntimeException("wnlin database not readable under "
                    + dir, e);
        }
        WORDS = words;
        PARENT = parent;
        IC = ic;
    }

    public NictWordNet() { load(); }

    /** Synset ids for (lemma, pos) — empty for OOV. */
    public List<String> getAllConcepts(String word, String pos) {
        List<String> r = WORDS.get(word.toLowerCase() + "|" + pos);
        return r != null ? r : new ArrayList<String>();
    }

    /** Hypernym chain from the synset up to (and including) the root. */
    public List<String> ancestors(String synset) {
        List<String> chain = new ArrayList<>();
        String s = synset;
        while (s != null) {
            chain.add(s);
            s = PARENT.get(s);
        }
        return chain;
    }

    public double ic(String synset) { return IC.get(synset); }
}
